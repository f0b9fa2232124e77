"""Math kernels: quaternions, tensor utilities, cone solvers, ICNN."""
