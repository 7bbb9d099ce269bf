"""Entity canonicalization: min-hash blocking + abbreviation blocking →
connected components → representative election.

All similarity machinery is JVM-side (whole-stage codegen): character
3-gram shingles via `transform(sequence(...))`, K min-hashes via
`array_min(transform(shingles, x -> hash(x, seed)))`, banded LSH self-join
for candidates, exact Jaccard verification on the survivors. Python never
touches a row here.

Connected components is the standard iterative min-id propagation
(GraphFrames-style large-star flavor): each round joins labels to edges,
takes the min neighbor component, and localCheckpoints to cut lineage.
Surface-variant chains in this domain have diameter ≤ 3, so convergence is
a handful of rounds; the loop is count-guarded, not fixed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def surface_shingles(surfaces: DataFrame, col: str = "surface") -> DataFrame:
    """+ `shingles`: distinct lowercase character 3-grams."""
    norm = F.lower(F.col(col))
    return surfaces.withColumn(
        "shingles",
        F.expr(
            f"array_distinct(transform(sequence(1, greatest(length(lower({col})) - 2, 1)),"
            f" i -> substring(lower({col}), i, 3)))"
        ),
    ).withColumn("_norm", norm)


def minhash_candidate_pairs(
    surfaces: DataFrame,
    num_hashes: int = 16,
    bands: int = 8,
    jaccard_threshold: float = 0.6,
) -> DataFrame:
    """(label, a, b, sim) candidate pairs with exact-Jaccard verification.

    LSH: K=num_hashes min-hashes, grouped into `bands` bands of K/bands
    rows; pairs sharing any (band, band_hash) bucket become candidates.
    The self-join shuffles on (label, band, band_hash) — AQE's skew-join
    splitting covers pathological buckets.

    Abbreviation-form surfaces ("J. Smith") are excluded: they carry almost
    no lexical signal of their own ("a. smith" vs "j. smith" is Jaccard
    0.71 — pairing them chains entire last-name families into one
    component), and the dedicated initial+last-name resolver in
    `abbreviation_pairs` handles them with actual evidence. The 0.6
    threshold separates same-entity variants ("tech corp" / "tech corp
    inc" ≈ 0.76) from same-family false friends ("nina johnson" / "paula
    johnson" = 0.50).
    """
    rows_per_band = num_hashes // bands
    surfaces = surfaces.where(~F.col("surface").rlike(r"^[A-Z]\. "))
    sh = surface_shingles(surfaces)
    # banding path drops the shingle arrays BEFORE the explode + self-join:
    # the band shuffle moves (label, surface, band, band_hash) only, and the
    # deduplicated candidate pairs re-join the one-copy shingle table for
    # exact-Jaccard verification (payload moves once per side, not ×bands).
    # The whole banding is ONE expression binding the shingle array once —
    # per-column minhash projections would let CollapseProject inline the
    # shingle computation into each of the `num_hashes` columns (same
    # pathology as ops/dedup.py, documented in docs/PERFORMANCE.md §1).
    band_struct = (
        "named_struct('band', b, 'band_hash', xxhash64("
        + ", ".join(
            f"array_min(transform(shingles, x -> hash(x, b * {rows_per_band} + {r})))"
            for r in range(rows_per_band)
        )
        + "))"
    )
    bands_expr = F.expr(
        f"transform(array(shingles), shingles -> transform(sequence(0, {bands - 1}), "
        f"b -> {band_struct}))[0]"
    )
    banded = sh.select(
        "surface", "label", F.explode(bands_expr).alias("bb")
    ).select("surface", "label", "bb.band", "bb.band_hash")

    left = banded.alias("l")
    right = banded.alias("r")
    cand = (
        left.join(
            right,
            on=[
                F.col("l.label") == F.col("r.label"),
                F.col("l.band") == F.col("r.band"),
                F.col("l.band_hash") == F.col("r.band_hash"),
                F.col("l.surface") < F.col("r.surface"),
            ],
        )
        .select(
            F.col("l.label").alias("label"),
            F.col("l.surface").alias("a"),
            F.col("r.surface").alias("b"),
        )
        .dropDuplicates(["label", "a", "b"])
    )
    # unlike the document-scale dedup variant (ops/dedup.py, which
    # semi-join-filters the shingle recompute to candidate ids), the
    # surface table here is ENTITY-sized: two direct re-joins of the
    # one-copy shingle table are payload-safe and keep the driver-serial
    # job count of this tiny-data stage minimal (each extra join in this
    # subplan is another AQE round over a handful of rows).
    shingle_tbl = sh.select("label", "surface", "shingles")
    sha = shingle_tbl.select(
        "label", F.col("surface").alias("a"), F.col("shingles").alias("sa")
    )
    shb = shingle_tbl.select(
        "label", F.col("surface").alias("b"), F.col("shingles").alias("sb")
    )
    ver = cand.join(sha, ["label", "a"]).join(shb, ["label", "b"])
    sim = F.size(F.array_intersect("sa", "sb")) / F.size(F.array_union("sa", "sb"))
    return ver.withColumn("sim", sim).where(F.col("sim") >= jaccard_threshold).select(
        "label", "a", "b", "sim"
    )


def abbreviation_pairs(link_stats: DataFrame) -> DataFrame:
    """Link 'J. Smith'-style abbreviations to their full expansion.

    Block key = (label, last token, first initial). Ambiguous blocks (two
    full names sharing an initial, e.g. John/Jane Smith) resolve to the
    most frequent expansion — a popularity prior that is deliberately,
    boundedly wrong for rare entities (see synth.py)."""
    persons = link_stats.where(F.col("label") == "Person")
    is_abbrev = F.col("surface").rlike(r"^[A-Z]\. ")
    key_last = F.element_at(F.split(F.col("surface"), " "), -1)
    key_init = F.substring(F.col("surface"), 1, 1)
    abbrevs = persons.where(is_abbrev).select(
        "label",
        F.col("surface").alias("a"),
        key_last.alias("k_last"),
        key_init.alias("k_init"),
    )
    fulls = persons.where(~is_abbrev).select(
        "label",
        F.col("surface").alias("b"),
        key_last.alias("k_last"),
        key_init.alias("k_init"),
        F.col("n_mentions"),
    )
    joined = abbrevs.join(fulls, ["label", "k_last", "k_init"])
    # argmax by mention count, surface as deterministic tiebreak
    best = joined.groupBy("label", "a").agg(
        F.max_by("b", F.struct(F.col("n_mentions"), F.col("b"))).alias("b")
    )
    return best.select("label", "a", "b", F.lit(1.0).alias("sim"))


def connected_components(
    spark: SparkSession,
    vertices: DataFrame,
    edges: DataFrame,
    max_iter: int = 20,
    rows_per_partition: int = 100_000,
    rounds_per_check: int = 2,
) -> DataFrame:
    """vertices(label, surface) + edges(label, a, b) → (label, surface, comp).

    comp = min xxhash64 id over the component; iterative min-propagation
    with localCheckpoint per driver action to keep the plan flat.

    Driver-serial cost is bounded two ways:
    - the loop tables are explicitly hash-partitioned to a width sized to
      the VERTEX count (`repartition(cc_p, key)` — not a session-conf
      mutation, which is racy under concurrent jobs and invisible to AQE):
      the iteration runs over entities, orders of magnitude fewer than
      documents, and pushing a handful of rows through the session's full
      shuffle width multiplies per-task overhead by the round count;
    - `rounds_per_check` propagation rounds are chained into ONE Spark job
      per convergence check (min-propagation is monotone, so "no change
      across a k-round block" is still an exact fixed-point test). Surface-
      variant chains have diameter ≤ 3, so this halves the driver barriers
      on the common path.
    """
    n_vertices = vertices.count()
    sess_p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    cc_p = max(1, min(sess_p, -(-n_vertices // rows_per_partition)))
    vid = F.xxhash64("label", "surface")
    labels = vertices.select("label", "surface", vid.alias("id")).withColumn(
        "comp", F.col("id")
    )
    eid_a = F.xxhash64("label", "a")
    eid_b = F.xxhash64("label", "b")
    und = edges.select(eid_a.alias("src"), eid_b.alias("dst")).unionByName(
        edges.select(eid_b.alias("src"), eid_a.alias("dst"))
    )
    # lazy checkpoints: each block's single convergence-count action
    # materializes the block's checkpoint as a side effect — one Spark job
    # per block instead of several (eager und/labels init + eager block
    # checkpoint + count). Both tables are pre-partitioned on their join
    # keys so the per-round join reuses the co-partitioning.
    und = und.repartition(cc_p, "dst").localCheckpoint(eager=False)
    labels = labels.repartition(cc_p, "id").localCheckpoint(eager=False)

    def propagate(lbl: DataFrame) -> DataFrame:
        neighbor_min = (
            und.join(
                lbl.select(F.col("id").alias("dst"), F.col("comp").alias("ncomp")),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("ncomp").alias("nmin"))
        )
        return lbl.join(neighbor_min, lbl.id == neighbor_min.src, "left").select(
            "label",
            "surface",
            "id",
            "old_comp",
            F.least(F.col("comp"), F.coalesce(F.col("nmin"), F.col("comp"))).alias(
                "comp"
            ),
        )

    rounds = 0
    while rounds < max_iter:
        block = labels.withColumn("old_comp", F.col("comp"))
        for _ in range(min(rounds_per_check, max_iter - rounds)):
            block = propagate(block)
            rounds += 1
        block = block.localCheckpoint(eager=False)
        changed = block.where(F.col("comp") != F.col("old_comp")).count()
        labels = block.select("label", "surface", "id", "comp")
        if changed == 0:
            break
    return labels.select("label", "surface", "comp")


def build_entity_map(
    spark: SparkSession,
    link_stats: DataFrame,
    num_hashes: int = 16,
    bands: int = 8,
    jaccard_threshold: float = 0.6,
) -> DataFrame:
    """(label, surface, canonical) — every observed surface mapped to its
    component representative (most-mentioned surface, surface-desc tiebreak)."""
    surfaces = link_stats.select("label", "surface", "n_mentions")
    mh_pairs = minhash_candidate_pairs(
        surfaces.select("surface", "label"), num_hashes, bands, jaccard_threshold
    )
    ab_pairs = abbreviation_pairs(link_stats)
    edges = mh_pairs.unionByName(ab_pairs).select("label", "a", "b").dropDuplicates()
    comps = connected_components(spark, surfaces.select("label", "surface"), edges)
    with_counts = comps.join(surfaces, ["label", "surface"])
    reps = with_counts.groupBy("label", "comp").agg(
        F.max_by("surface", F.struct(F.col("n_mentions"), F.col("surface"))).alias("canonical")
    )
    return (
        with_counts.join(reps, ["label", "comp"])
        .select("label", "surface", "canonical")
    )


def canonicalize_triples(triples_raw: DataFrame, entity_map: DataFrame) -> DataFrame:
    """triples_raw × entity_map (broadcast: the map is distinct-entity-sized,
    orders of magnitude smaller than the triple stream) → canonical triples."""
    subj_map = F.broadcast(
        entity_map.select(
            F.col("label").alias("subj_label"),
            F.col("surface").alias("subj"),
            F.col("canonical").alias("subj_canonical"),
        )
    )
    obj_map = F.broadcast(
        entity_map.select(
            F.col("label").alias("obj_label"),
            F.col("surface").alias("obj"),
            F.col("canonical").alias("obj_canonical"),
        )
    )
    return (
        triples_raw.join(subj_map, ["subj_label", "subj"], "left")
        .join(obj_map, ["obj_label", "obj"], "left")
        .select(
            "doc_id",
            "span_idx",
            F.coalesce("subj_canonical", "subj").alias("subj"),
            "pred",
            F.coalesce("obj_canonical", "obj").alias("obj"),
            "subj_label",
            "obj_label",
            "conf",
        )
    )
