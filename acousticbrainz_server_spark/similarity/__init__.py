"""Similarity engine (SURVEY.md §2.9): metric vectors, normalization stats,
exact k-NN + neighbor post-processing — the reference's similarity/ package
re-expressed as DataFrame pipelines."""
