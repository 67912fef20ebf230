"""Pallas TPU kernels for the hot SfM ops (SURVEY.md §7 kernel list):
descriptor matching, ICP nearest-neighbor search, BA block assembly."""
