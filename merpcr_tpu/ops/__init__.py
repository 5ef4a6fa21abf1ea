"""Device-side ops: encoding LUTs, STS table compiler, tile scan pipeline."""
