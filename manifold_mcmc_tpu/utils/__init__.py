"""Precision config, pytree helpers, diagnostics and experiment IO."""
