"""Sources: synthetic corpus generation, seed expansion, parquet IO."""
