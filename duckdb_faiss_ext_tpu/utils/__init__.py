"""Shared utilities: runtime config, padding/bucketing helpers, data loaders."""
