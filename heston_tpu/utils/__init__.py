"""Runtime utilities: exporters, profiling hooks, native CPU oracle."""
