"""Config-driven transform registry + pipeline builder.

The reference dispatches named custom transforms from a JSON config,
validating method existence by reflection and tracking applied operations
per record (/root/reference/bcdc2bcdc/CKANData.py:481-573
``applyCustomTransformations``; CustomTransformers.MethodMapping :24-120;
per-phase selection ADD/UPDATE/COMPARE :124-151). Here the same contract
is a declarative config::

    {
      "compare":  [ {"name": "canonical_nullish", "columns": ["lang"]}, ... ],
      "update":   [ {"name": "required_default", "column": "lang",
                     "default": "und"}, ... ],
      "add":      [ ... ],
      "ignore_repos": ["vendored/ignored-a"]
    }

validated at build time (unknown name / bad kwargs fail fast, like the
reference's ``TransformationTypeError``), compiled once into a list of
DataFrame→DataFrame stages, and applied as lazy plan construction —
nothing mutates, nothing can run twice.
"""

from __future__ import annotations

import inspect
import json
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame

from bcdc2bcdc_spark.transforms.builtin import BUILTIN_TRANSFORMS, Transform

PHASES = ("compare", "add", "update")


class TransformConfigError(ValueError):
    """Unknown transform name or invalid kwargs (MethodMapping analog)."""


def build_transform(spec: dict, registry: dict[str, Callable[..., Transform]] | None = None) -> Transform:
    reg = {**BUILTIN_TRANSFORMS, **(registry or {})}
    spec = dict(spec)
    name = spec.pop("name", None)
    if name not in reg:
        raise TransformConfigError(
            f"unknown transform {name!r}; known: {sorted(reg)}"
        )
    builder = reg[name]
    try:
        inspect.signature(builder).bind(**spec)
    except TypeError as exc:
        raise TransformConfigError(f"bad config for {name!r}: {exc}") from exc
    return builder(**spec)


def build_pipeline(
    specs: Sequence[dict],
    registry: dict[str, Callable[..., Transform]] | None = None,
) -> Transform:
    """Compose configured transforms into one DataFrame→DataFrame stage."""
    stages = [build_transform(s, registry) for s in specs]

    def apply(df: DataFrame) -> DataFrame:
        for stage in stages:
            df = stage(df)
        return df

    return apply


class TransformConfig:
    """Parsed transform configuration with per-phase pipelines."""

    def __init__(self, config: dict, registry: dict[str, Callable[..., Transform]] | None = None):
        self.ignore_repos: tuple[str, ...] = tuple(config.get("ignore_repos", ()))
        self._pipelines: dict[str, Transform] = {
            phase: build_pipeline(config.get(phase, ()), registry) for phase in PHASES
        }

    @classmethod
    def from_json(cls, path: str, registry=None) -> "TransformConfig":
        with open(path) as fh:
            return cls(json.load(fh), registry)

    def pipeline(self, phase: str) -> Transform:
        if phase not in self._pipelines:
            raise TransformConfigError(f"unknown phase {phase!r}; want one of {PHASES}")
        return self._pipelines[phase]

    def apply(self, df: DataFrame, phase: str = "compare") -> DataFrame:
        return self.pipeline(phase)(df)
