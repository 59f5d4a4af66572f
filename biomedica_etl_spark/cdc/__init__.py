"""CDC engine: generator, oracle, reduce, merge, table, checkpoint, runner."""
