"""Engine operators: DataFrame-in / DataFrame-out transformations.

- ``lww``        last-write-wins merge (the reference's read-time dedup, O6)
- ``asof``       as-of join (latest sample at-or-before an event time)
- ``rollups``    time-bucket aggregation views
- ``dedup``      exact + near-duplicate detection over documents
- ``components`` connected components over candidate pairs (large-star/
                 small-star) + canonical-doc selection — the dedup
                 pipeline's transitive 'keep one copy' final stage
- ``similarity`` embedding similarity search (brute-force + LSH-bucketed)
- ``text``       text analysis: language ID, quality score, tokens, fingerprint
- ``lm``         unigram language-model quality scoring (corpus-fit logprobs)
- ``packing``    concat-and-chunk sequence packing: layout, manifest,
                 window materialization
- ``sampling``   deterministic hash-mod mixing, quota top-up, hash splits
- ``filtering``  domain blocklists + one-row corpus report card
- ``pipeline``   one-call batch curation composing the above with
                 auditable per-document drop reasons
- ``resample``   regular-grid gap filling (LOCF / linear), M4
                 downsampling, counter rate with reset detection
- ``multimodal`` opaque-binary column plumbing (decode stubs, real Spark shape)
"""
