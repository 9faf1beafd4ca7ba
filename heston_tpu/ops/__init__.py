"""Numerical building blocks: grids, FD weights, operators, banded solvers."""
