"""Engine operators: DataFrame → DataFrame transformations covering
SURVEY.md §2 plus the large-scale training-data-pipeline extensions
(dedup families, similarity search, text analysis).
"""
