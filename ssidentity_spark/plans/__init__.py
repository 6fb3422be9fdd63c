"""Driver-facing query plans. Importing this package registers every query.

Modules (one per SURVEY.md §2 family):
- analytics  — aggregations / windows / set ops over ``events`` (A*, W*, O*)
- tpch       — join-heavy queries over the star schema (J*)
- scalars    — scalar-function surface incl. FSPL math (D1, D7)
- dedup      — exact + MinHash-LSH + SimHash + Jaccard + embedding near-dup
- similarity — ANN / top-k cosine over ``embeddings`` (U5)
- text       — language-ID, quality, tokens, fingerprints over ``documents`` (U6)
- multimodal — binary-column plumbing (decode stubs, typed metadata)
"""

from ssidentity_spark.plans import (  # noqa: F401
    analytics,
    dedup,
    extras,
    multimodal,
    reference_pipeline,
    scalars,
    similarity,
    sqlapi,
    text,
    tpch,
    tpch2,
)
