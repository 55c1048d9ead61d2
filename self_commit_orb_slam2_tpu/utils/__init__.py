"""Host-side utilities: synthetic data, dataset IO, trajectories, evaluation, config."""
