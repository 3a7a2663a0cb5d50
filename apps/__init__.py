"""CLI entry points (reference src/ entry scripts, SURVEY.md §2.5).

Each module is runnable both as ``python apps/<name>.py`` and through the
installed console scripts declared in pyproject.toml.
"""
