"""Training-data pipeline operators built on the same Ray-Data-first
patterns as the CDC engine: vectorized Arrow batch transforms, partial
(combiner) aggregation before any shuffle, broadcast small sides.
"""
