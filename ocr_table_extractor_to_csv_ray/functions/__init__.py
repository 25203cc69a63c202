"""Corpus-scale training-data operators (dedup, similarity, text analysis).

These are first-class engine components beyond the reference's own
operator set (SURVEY.md §2): the operations a large-scale training-data
pipeline needs at 100 TB. All are expressed Ray-Data-first: vectorized
``map_batches`` stages, partial aggregation before any ``groupby``,
broadcast small sides via ``ray.put``.
"""
