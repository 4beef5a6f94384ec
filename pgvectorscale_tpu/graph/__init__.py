"""Vamana graph algorithms: batched beam search, RobustPrune, wave build."""
