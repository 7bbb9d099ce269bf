"""Engine-independent oracle kernels.

Pure-Python reimplementations of the hash functions Spark's built-in
`hash()` / `xxhash64()` expressions compute, so hash-dependent operators
(MinHash LSH banding, SimHash) can be verified against a VALUES oracle
built without Spark. Everything here follows the PUBLIC algorithm specs
(Austin Appleby's MurmurHash3, Yann Collet's xxHash) plus Spark's
documented seeding/composition rules.
"""

from .sparkhash import spark_hash, spark_xxhash64  # noqa: F401
