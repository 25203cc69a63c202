"""``map_batches`` stage callables: stateless geometry kernels and
stateful actor-pool classes (OCR, layout model)."""
