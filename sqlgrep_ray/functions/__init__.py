"""Expression compiler and scalar-function kernels (Arrow-compute first)."""
