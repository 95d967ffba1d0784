"""Declarative pipeline specification.

The reference hard-codes its pipelines inside CLI verb bodies
(SURVEY.md §2.6 notes the missing step API). Here a pipeline is an
ordered list of ``Stage`` declarations applied to a Dataset — each
stage is independently constructible and testable (pass a plain
pyarrow Table to its kernel), and the spec itself is data: it can be
printed, diffed, and parameterized.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional, Union


@dataclass
class Stage:
    name: str
    fn: Union[Callable, type]
    batch_format: str = "pyarrow"
    batch_size: Optional[int] = None
    fn_kwargs: Dict[str, Any] = field(default_factory=dict)
    fn_constructor_kwargs: Dict[str, Any] = field(default_factory=dict)
    concurrency: Optional[int] = None   # int → actor pool; None → tasks
    num_cpus: Optional[float] = None

    def apply(self, ds):
        kwargs: Dict[str, Any] = {"batch_format": self.batch_format}
        if self.batch_size is not None:
            kwargs["batch_size"] = self.batch_size
        if self.num_cpus is not None:
            kwargs["num_cpus"] = self.num_cpus
        if isinstance(self.fn, type):
            if self.concurrency is None:
                raise ValueError(
                    f"Stage {self.name!r}: a class stage needs concurrency "
                    "(actor pool size)")
            kwargs["fn_constructor_kwargs"] = self.fn_constructor_kwargs
            kwargs["concurrency"] = self.concurrency
        else:
            if self.fn_kwargs:
                kwargs["fn_kwargs"] = self.fn_kwargs
            if self.concurrency is not None:
                kwargs["concurrency"] = self.concurrency
        return ds.map_batches(self.fn, **kwargs)


@dataclass
class PipelineSpec:
    name: str
    stages: list

    def apply(self, ds):
        for s in self.stages:
            ds = s.apply(ds)
        return ds

    def describe(self) -> str:
        lines = [f"pipeline {self.name}:"]
        for s in self.stages:
            kind = "actors" if isinstance(s.fn, type) else "tasks"
            lines.append(
                f"  - {s.name} [{kind}, {s.batch_format}"
                + (f", batch={s.batch_size}" if s.batch_size else "")
                + (f", concurrency={s.concurrency}" if s.concurrency else "")
                + "]")
        return "\n".join(lines)


def kg_stage1_spec(n_entities: int = 10_000, n_buckets: int = 32,
                   batch_size: int = 2048, out_dir: str = "/tmp/kg",
                   shard_id: int = 0, alias_ref=None) -> PipelineSpec:
    """The flagship stage-1 topology as a spec (what run_kg_pipeline
    executes per shard)."""
    from ..sinks.partitioned import write_partitioned_batch
    from ..stages.extract import extract_link_kernel

    return PipelineSpec("kg-stage1", [
        Stage("extract+link", extract_link_kernel, batch_size=batch_size,
              fn_kwargs={"n_entities": n_entities, "n_buckets": n_buckets,
                         "alias_ref": alias_ref}),
        Stage("partitioned-write", write_partitioned_batch,
              fn_kwargs={"out_dir": out_dir, "shard_id": shard_id}),
    ])
