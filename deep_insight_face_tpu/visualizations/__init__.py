from deep_insight_face_tpu.visualizations.plot import (  # noqa: F401
    grid_visualization,
    hist_plot,
    pca_visualization,
    tsne_visualization,
)

__all__ = [
    "grid_visualization",
    "hist_plot",
    "pca_visualization",
    "tsne_visualization",
]
