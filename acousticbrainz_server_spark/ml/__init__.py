"""Dataset evaluation pipeline (SURVEY.md §2.10): validation, artist-filtered
train/test splits, class normalization, SVM training, snapshots."""
