"""Declarative pipeline-step API (SURVEY §2.10): the reference ships
one hand-rolled script per task (make_original.py, make_expand.py,
...); the engine's user-extension surface is a list of stage specs
compiled onto chained Ray Data ops."""

from osmray.pipelines.declarative import STAGES, run_pipeline  # noqa: F401
