from . import (  # noqa: F401
    colors,
    components,
    forest_eval,
    forest_eval_pallas,
    meanshift,
    plane,
    points,
    posefit,
    render,
)
