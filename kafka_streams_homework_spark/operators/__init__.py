"""Operator library.

relational   the reference's operator inventory (SURVEY.md §2) + the
             standard relational surface Spark gives for free
dedup        exact + near-duplicate detection (minhash/simhash/ngram)
similarity   embedding similarity search (brute-force + bucketed ANN)
text         text analysis (lang-id, quality, tokens, fingerprints)
multimodal   binary-column plumbing for image/audio/video payloads
"""
