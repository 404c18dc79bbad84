"""Pure per-URL / per-document functions used inside map_batches stages."""
