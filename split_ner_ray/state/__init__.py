"""Persistent job state: partition manifests, resume filters, metrics."""
