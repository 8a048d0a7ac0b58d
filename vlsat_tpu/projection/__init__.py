from vlsat_tpu.projection.multiview import (  # noqa: F401
    project_points,
    crop_box,
    select_view_crops,
    MultiViewFeatureExtractor,
)
