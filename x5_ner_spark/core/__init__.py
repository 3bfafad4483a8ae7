"""Pure-Python deterministic semantics. No Spark imports here.

Everything in this package is a pure function of its inputs so that the
exact same code runs (a) inside Arrow-vectorized pandas UDFs on executors
and (b) in the pytest / pandas oracle on the driver — the per-row
byte-identity invariant from BASELINE.json falls out of that sharing.
"""
