"""Reporting: paper tables, significance tests, figures
(reference: auxiliary/notebooks_and_reporting/)."""
