"""lauchy_ray — a Ray-Data-native streaming validation / CEP engine
(from-scratch rebuild of genny-project/lauchy's capabilities, generalized
to windowed/sessionized processing over Parquet transcript tables).

Import side effect: every ``lauchy_ray.*`` module is registered with Ray's
cloudpickle for BY-VALUE serialization. Ray workers inherit the raylet's
environment, not the driver's ``sys.path`` — when a host (e.g. the
evaluation driver) imports this package from a working directory outside
the repo, workers could not import ``lauchy_ray`` by reference and every
actor/task would die with ModuleNotFoundError. By-value registration ships
the code inside the pickled callables instead, making the engine importable
from anywhere without runtime_env support (unavailable in this sandbox).
"""

from __future__ import annotations

import sys


def _register_by_value() -> None:
    try:
        from ray import cloudpickle
    except Exception:  # pragma: no cover - ray always present in this env
        return
    if not hasattr(cloudpickle, "register_pickle_by_value"):
        return
    for name, mod in list(sys.modules.items()):
        if mod is not None and (name == __name__ or name.startswith(__name__ + ".")):
            try:
                cloudpickle.register_pickle_by_value(mod)
            except Exception:
                pass


# Eagerly import the modules whose callables cross the driver→worker
# boundary, then register everything loaded so far.
from . import rules, schema  # noqa: E402,F401
from .functions import checksums, text  # noqa: E402,F401
from .sources import json_ingest, stream  # noqa: E402,F401
from .stages import (bucketing, decontam, dedup, dedup_near,  # noqa: E402,F401
                     fuzzy, graph, join, multimodal, patterns, sessionize,
                     sketches, terms, textops, validator, watermark, windows)
from .state import sink, streaming  # noqa: E402,F401
from . import datagen, events_bridge, oracle  # noqa: E402,F401
from .pipelines import checkpointed, queries, validate  # noqa: E402,F401

_register_by_value()
