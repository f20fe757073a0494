"""Command-line entry points per dataset."""
