"""Serving: interactive demo + programmatic predictors (reference: app.py)."""
