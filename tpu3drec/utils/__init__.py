"""Config tree, IO (PLY/poses/depth), logging and profiling utilities."""
