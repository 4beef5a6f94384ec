"""Host-side utilities: checkpoint IO, dataset helpers."""
