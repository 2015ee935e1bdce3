from viforsdes_tpu.posterior.posterior import (
    InferenceDiagnostics,
    Quantiles,
    VariationalPosterior,
    VariationalPosteriorSamples,
    VariationalPosteriorSummary,
)

__all__ = [
    "VariationalPosterior",
    "VariationalPosteriorSamples",
    "VariationalPosteriorSummary",
    "Quantiles",
    "InferenceDiagnostics",
]
