from . import forest_eval, points, plane, meanshift, components, colors  # noqa: F401
