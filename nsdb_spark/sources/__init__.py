"""Source adapters: driver testdata tables, metric-frame construction."""
