"""Pricing models: Douglas ADI PDE solver, Black-Scholes and MC oracles."""
