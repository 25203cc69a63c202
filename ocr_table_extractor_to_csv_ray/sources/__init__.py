"""Corpus sources: deterministic synthetic fixtures, driver-table
renderers, and a real hOCR reader."""
