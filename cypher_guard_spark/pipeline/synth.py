"""Deterministic synthetic corpus generator (FIXTURES.md F1/F2).

Emits the interleaved text+media ``documents`` table from BASELINE.json
input_hint:

    documents(doc_id string,
              spans array<struct<kind string, text string,
                                 media_ref string, offset int>>)

plus the embedded ground-truth triple table for P/R measurement. Facts are
drawn from a closed world (people/companies/locations) with:
- deliberate surface-form variants ("J. Smith" for "John Smith") that the
  canonicalization stage must resolve,
- a Zipf-skewed hub person so link-scoring exercises the salted shuffle,
- interleaved image/table/code media spans with strictly increasing offsets
  (the span-sequence invariant the pipeline must preserve).

Generation is distributed: the doc_id range is parallelized and each doc is
rendered from ``random.Random(seed * 1_000_003 + idx)`` — no driver-side
loops, reproducible at any scale and any partitioning.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

SEED = 42

# 20 first names with pairwise-distinct initials: any 6 consecutive picks
# (mod 20) per last name yield unambiguous "X. Last" abbreviations. The one
# deliberate ambiguity is Jane Smith, appended separately below.
FIRST_NAMES = [
    "John", "Alice", "Bob", "Carol", "David", "Emma", "Frank", "Grace",
    "Henry", "Iris", "Kevin", "Laura", "Mike", "Nina", "Oscar", "Paula",
    "Quinn", "Rosa", "Sam", "Tara",
]
LAST_NAMES = [
    "Smith", "Doe", "Johnson", "Williams", "Brown", "Davis", "Miller",
    "Wilson", "Moore", "Taylor",
]
COMPANIES = [
    "Tech Corp", "Acme Industries", "Globex Labs", "Initech Systems",
    "Umbrella Works", "Stark Foundry", "Wayne Logistics", "Hooli Cloud",
    "Vandelay Exports", "Pied Piper Data", "Aperture Optics", "Soylent Farms",
]
CITIES = [
    "Berlin", "Lisbon", "Austin", "Toronto", "Osaka", "Nairobi",
    "Helsinki", "Montevideo",
]

NOISE_SENTENCES = [
    "The quarterly report was filed on time.",
    "Weather conditions remained stable throughout the week.",
    "The committee adjourned without further discussion.",
    "Several unrelated documents were archived.",
    "No additional details were provided.",
]

MEDIA_KINDS = ("image", "table", "code")


def people():
    """61 people. Initials are unique within every last name, EXCEPT the
    deliberate John Smith / Jane Smith collision: Jane sits at the end of
    the list, i.e. in the tail of the Zipf pick, so "J. Smith" ambiguity is
    real but rare — P/R ≥ 0.95 stays honest rather than vacuous. The
    canonicalizer resolves ambiguous abbreviations to the most frequent
    expansion (popularity prior), which is wrong exactly when a rare Jane
    mention is abbreviated."""
    out = []
    for li, last in enumerate(LAST_NAMES):
        for fi in range(6):
            first = FIRST_NAMES[(li * 6 + fi) % len(FIRST_NAMES)]
            out.append(f"{first} {last}")
    out.append("Jane Smith")
    return out


PEOPLE = people()


def _company_variant(name: str, rng: random.Random) -> str:
    """15% 'Inc'-suffixed alias — high 3-gram Jaccard with the canonical
    name, resolved by the min-hash + LSH blocking path."""
    if rng.random() < 0.15:
        return f"{name} Inc"
    return name


def _person_variant(name: str, rng: random.Random) -> str:
    """30% abbreviated surface form; never abbreviate the collision pair's
    partner beyond what P/R ≥ 0.95 tolerates (both John/Jane Smith can
    produce 'J. Smith' — a genuine ambiguity the pipeline must survive)."""
    if rng.random() < 0.30:
        first, last = name.split(" ", 1)
        return f"{first[0]}. {last}"
    return name


def _zipf_person(rng: random.Random) -> str:
    """Hub-skewed person pick: index ∝ u^3 → person 0 is the hub."""
    idx = int(len(PEOPLE) * (rng.random() ** 3))
    return PEOPLE[min(idx, len(PEOPLE) - 1)]


def _facts_for_doc(rng: random.Random):
    """0-6 ground-truth facts, canonical names."""
    n = rng.randint(0, 6)
    facts = []
    for _ in range(n):
        kind = rng.random()
        if kind < 0.45:
            p = _zipf_person(rng)
            c = rng.choice(COMPANIES)
            facts.append(("WORKS_FOR", p, c))
        elif kind < 0.8:
            a = _zipf_person(rng)
            b = rng.choice(PEOPLE)
            if a != b:
                facts.append(("KNOWS", a, b))
        else:
            c = rng.choice(COMPANIES)
            city = rng.choice(CITIES)
            facts.append(("LOCATED_IN", c, city))
    return facts


def _render_doc(idx: int):
    """One document: interleaved text/media spans with increasing offsets."""
    rng = random.Random(SEED * 1_000_003 + idx)
    facts = _facts_for_doc(rng)
    spans = []
    offset = 0

    def push(kind, text, media_ref=""):
        nonlocal offset
        spans.append({"kind": kind, "text": text, "media_ref": media_ref, "offset": offset})
        offset += len(text) + 1

    media_count = 0
    for fact in facts:
        rel, s, o = fact
        if rel == "WORKS_FOR":
            s_surf = _person_variant(s, rng)
            o_surf = _company_variant(o, rng)
            push("text", f"{s_surf} works for {o_surf}.")
        elif rel == "KNOWS":
            s_surf = _person_variant(s, rng)
            o_surf = _person_variant(o, rng)
            push("text", f"{s_surf} knows {o_surf}.")
        else:
            s_surf = _company_variant(s, rng)
            push("text", f"{s_surf} is located in {o}.")
        if rng.random() < 0.4:
            kind = rng.choice(MEDIA_KINDS)
            push(kind, f"{kind} attachment {media_count}", f"media://doc-{idx:08d}/{media_count}")
            media_count += 1
    for _ in range(rng.randint(0, 2)):
        push("text", rng.choice(NOISE_SENTENCES))
    return (f"doc-{idx:08d}", spans)


def _gt_for_doc(idx: int):
    rng = random.Random(SEED * 1_000_003 + idx)
    return [(f"doc-{idx:08d}", s, rel, o) for rel, s, o in _facts_for_doc(rng)]


DOC_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField(
            "spans",
            ArrayType(
                StructType(
                    [
                        StructField("kind", StringType()),
                        StructField("text", StringType()),
                        StructField("media_ref", StringType()),
                        StructField("offset", IntegerType()),
                    ]
                )
            ),
        ),
    ]
)

GT_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("subj", StringType()),
        StructField("pred", StringType()),
        StructField("obj", StringType()),
    ]
)


def synthesize_documents(spark: SparkSession, n_docs: int, partitions: int | None = None) -> DataFrame:
    """Distributed deterministic generation — the range is the only driver
    artifact; rendering happens on executors, batched through Arrow via
    mapInPandas (the RDD.map + createDataFrame route pays row-at-a-time
    pickle + schema verification, ~10x slower)."""
    import pandas as pd

    if partitions is None:
        partitions = max(4, min(256, n_docs // 2000 or 4))

    def gen(pdf_iter):
        for pdf in pdf_iter:
            rows = [_render_doc(int(i)) for i in pdf["id"]]
            yield pd.DataFrame(
                {"doc_id": [r[0] for r in rows], "spans": [r[1] for r in rows]}
            )

    return spark.range(0, n_docs, 1, partitions).mapInPandas(gen, DOC_SCHEMA)


def ground_truth_triples(spark: SparkSession, n_docs: int, partitions: int | None = None) -> DataFrame:
    """(doc_id, subj, pred, obj) with canonical entity names — the oracle
    the pipeline's emitted triples are P/R-scored against."""
    import pandas as pd

    if partitions is None:
        partitions = max(4, min(256, n_docs // 2000 or 4))

    def gen(pdf_iter):
        for pdf in pdf_iter:
            rows = [t for i in pdf["id"] for t in _gt_for_doc(int(i))]
            yield pd.DataFrame(rows, columns=["doc_id", "subj", "pred", "obj"])

    return spark.range(0, n_docs, 1, partitions).mapInPandas(gen, GT_SCHEMA)


def pipeline_db_schema():
    """The target graph DbSchema (FIXTURES.md F2) the MERGE batches are
    validated against."""
    from ..guard import DbSchema

    return DbSchema.from_dict(
        {
            "node_props": {
                "Person": [
                    {"name": "firstName", "neo4j_type": "STRING"},
                    {"name": "lastName", "neo4j_type": "STRING"},
                    {"name": "age", "neo4j_type": "INTEGER"},
                    {"name": "email", "neo4j_type": "STRING"},
                    {"name": "active", "neo4j_type": "BOOLEAN"},
                ],
                "Company": [
                    {"name": "companyName", "neo4j_type": "STRING"},
                    {"name": "foundedYear", "neo4j_type": "INTEGER"},
                    {
                        "name": "industry",
                        "neo4j_type": "STRING",
                        "enum_values": [
                            "Technology",
                            "Finance",
                            "Healthcare",
                            "Education",
                            "Manufacturing",
                        ],
                    },
                ],
                "Location": [
                    {"name": "city", "neo4j_type": "STRING"},
                    {"name": "country", "neo4j_type": "STRING"},
                    {"name": "coordinates", "neo4j_type": "POINT"},
                ],
            },
            "rel_props": {
                "WORKS_FOR": [
                    {"name": "position", "neo4j_type": "STRING"},
                    {"name": "salary", "neo4j_type": "FLOAT"},
                ],
                "KNOWS": [{"name": "sinceYear", "neo4j_type": "INTEGER"}],
                "LOCATED_IN": [{"name": "since", "neo4j_type": "DATE_TIME"}],
            },
            "relationships": [
                {"start": "Person", "end": "Company", "rel_type": "WORKS_FOR"},
                {"start": "Person", "end": "Person", "rel_type": "KNOWS"},
                {"start": "Company", "end": "Location", "rel_type": "LOCATED_IN"},
            ],
            "metadata": {"constraint": [], "index": []},
        }
    )
