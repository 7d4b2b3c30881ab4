"""benchmarks subpackage."""
