"""Host-side data pipelines producing static-shape batches for the TPU."""
