from .gp import (
    GPConfig,
    GPParams,
    confidence_region,
    elbo,
    embedding_dataset,
    fit_gp,
    fit_gp_streaming,
    gp_predict_f,
    gp_predict_y,
    init_gp,
    kl_divergence,
    load_gp,
)

__all__ = [
    "GPConfig",
    "GPParams",
    "confidence_region",
    "elbo",
    "embedding_dataset",
    "fit_gp",
    "fit_gp_streaming",
    "gp_predict_f",
    "gp_predict_y",
    "init_gp",
    "kl_divergence",
    "load_gp",
]
