"""The flagship pipeline: the reference topology, Ray-Data-first.

≙ buildTopology() (TopologyProducer.java:126-140):
    stream("data") → peek → filter(null) → mapValues(tidy) →
    filter(validate) → peek → to("valid_data")   [+ blacklists/webdata side]

Here::

    read_parquet(turns) → map_batches(drop_null+tidy)            [stateless tasks]
    → map_batches(Validator, actor pool, zero-copy Arrow)        [stateful]
    → split valid / rejected / side                              [vectorized filters]

The Dataset stays lazy; the streaming executor pipelines and applies
backpressure. Nothing materializes the full input.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..rules import DEFAULT_RULES
from ..stages.validator import Validator, split_streams


def _drop_null_text(batch: pa.Table) -> pa.Table:
    # ≙ the null filter (TopologyProducer.java:133)
    return batch.filter(pc.is_valid(batch["text"]))


_WORKER_VALIDATOR_CACHE: dict = {}


class _CachedValidator:
    """Stateless-task variant: the Validator state is built once per WORKER
    PROCESS (module-level cache keyed by the broadcast refs) instead of once
    per actor. Elastic like any task pool — no actor spawn latency — while
    still amortizing rule compilation. Use for small dictionaries; prefer
    the actor pool (use_actors=True) when the broadcast state is large
    enough that per-worker duplication matters."""

    def __init__(self, cache_key, kwargs):
        self.cache_key = cache_key
        self.kwargs = kwargs

    def __call__(self, batch):
        v = _WORKER_VALIDATOR_CACHE.get(self.cache_key)
        if v is None:
            # small bound per worker process: every pipeline construction
            # mints fresh refs (a new key) so unbounded growth would leak
            # entity-set copies, but evicting to zero would thrash when two
            # concurrent pipelines interleave batches on one worker
            while len(_WORKER_VALIDATOR_CACHE) >= 4:
                _WORKER_VALIDATOR_CACHE.pop(next(iter(_WORKER_VALIDATOR_CACHE)))
            v = Validator(**self.kwargs)
            _WORKER_VALIDATOR_CACHE[self.cache_key] = v
        return v(batch)


def validated_stream(turns: rd.Dataset, rules=None, entity_codes=None,
                     enable_blacklist: bool = True,
                     concurrency=(2, 8), batch_size: int = 32768,
                     use_actors: bool = True) -> rd.Dataset:
    """turns → validated stream with (valid, reject_reason, side) appended.

    The rules/entities dictionaries are broadcast once with ``ray.put`` and
    re-read per ACTOR (not per batch) in ``Validator.__init__``.
    """
    from .. import rules as R
    rules = DEFAULT_RULES if rules is None else rules
    R._register_builtin_predicates()
    kwargs = {"rules_ref": ray.put(rules), "enable_blacklist": enable_blacklist,
              # snapshot the DRIVER's predicate registry (custom kinds
              # registered here must reach worker-side Validator state)
              "predicates": dict(R.PREDICATE_REGISTRY)}
    if entity_codes is not None:
        kwargs["entities_ref"] = ray.put(sorted(set(entity_codes)))
    ds = turns.map_batches(_drop_null_text, batch_format="pyarrow")
    if use_actors:
        return ds.map_batches(
            Validator,
            fn_constructor_kwargs=kwargs,
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
            num_cpus=1,
        )
    fn = _CachedValidator((kwargs["rules_ref"], kwargs.get("entities_ref"),
                           enable_blacklist), kwargs)
    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


_SIDE_SYNTH_CACHE: dict = {}


def run_flagship(turns_path: str, entities_path: str | None = None,
                 out_dir: str | None = None, enable_blacklist: bool = True,
                 concurrency=(2, 8), user_token: str = ""):
    """read → validate → split; optionally write the sinks.

    With an entities table, a fourth ``webdata`` sink is written carrying
    SYNTHESIZED side records (entity wrapped with total/return_count/token,
    ≙ TopologyProducer.java:215-221) — the raw ``side`` rows remain for
    debugging, but a webdata consumer of the reference reads ``webdata``.

    Returns (valid, rejected, side) Datasets (lazy if out_dir is None).
    """
    import ray as _ray

    turns = rd.read_parquet(turns_path)
    entity_codes = None
    names_ref = None
    if entities_path is not None:
        import pyarrow.parquet as pq
        ents = pq.read_table(entities_path, columns=["code", "name"])
        entity_codes = ents["code"].to_pylist()
        names_ref = _ray.put(dict(zip(ents["code"].to_pylist(),
                                      ents["name"].to_pylist())))
    ds = validated_stream(turns, entity_codes=entity_codes,
                          enable_blacklist=enable_blacklist, concurrency=concurrency)
    if out_dir is not None:
        # single pass, STREAMING: one writer stage routes each batch to all
        # sinks (Ray Data derived Datasets don't share subplans, so
        # separate write_parquet calls would re-validate the input N
        # times; materializing instead would pin the full corpus). For the
        # exactly-once/atomic/resumable sink use pipelines.checkpointed.
        import os
        import uuid

        from ..stages.validator import SideRecordSynthesizer

        def write_split(t: pa.Table) -> pa.Table:
            import pyarrow.parquet as pq
            tag = uuid.uuid4().hex[:12]
            outs = [("valid", t.filter(t["valid"])),
                    ("rejected", t.filter(pc.invert(t["valid"]))),
                    ("side", t.filter(t["side"]))]
            if names_ref is not None:
                # synthesizer state built once per worker process
                key = (names_ref.hex(), user_token)
                syn = _SIDE_SYNTH_CACHE.get(key)
                if syn is None:
                    _SIDE_SYNTH_CACHE.clear()
                    syn = SideRecordSynthesizer(names_ref=names_ref,
                                                token=user_token)
                    _SIDE_SYNTH_CACHE[key] = syn
                outs.append(("webdata", syn(t)))
            for name, sub in outs:
                os.makedirs(f"{out_dir}/{name}", exist_ok=True)
                if sub.num_rows:
                    pq.write_table(sub, f"{out_dir}/{name}/part-{tag}.parquet")
            return pa.table({"rows": pa.array([t.num_rows], pa.int64())})

        ds.map_batches(write_split, batch_format="pyarrow").count()
    return split_streams(ds)
