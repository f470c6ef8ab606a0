"""attend_infer_repeat_tpu: a TPU-native Attend-Infer-Repeat framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the public
``akosiorek/attend_infer_repeat`` TF1 reference (see SURVEY.md for the
structural analysis this build follows).

The workflow surface re-exports lazily at the top level::

    import attend_infer_repeat_tpu as air
    cfg = air.get_config("canonical_fast")
    model = air.AIRModel(cfg.model)
    air.train(cfg, workdir="runs/demo")

Full per-subpackage reference: ``docs/API.md``.
"""

__version__ = "0.1.0"

# Top-level convenience surface.  Resolved lazily via PEP 562 so that
# ``import attend_infer_repeat_tpu`` stays cheap (no jax/flax import)
# until a symbol is actually touched — the train CLI and bench scripts
# import submodules directly and never pay for siblings.
_EXPORTS = {
    # configs
    "Config": "configs",
    "get_config": "configs",
    "PRESETS": "configs",
    # models
    "AIRModel": "models",
    "AIRCell": "models",
    "AIROutputs": "models",
    "AIRStepOutput": "models",
    # train
    "train": "train",
    "TrainState": "train",
    "create_train_state": "train",
    "make_train_step": "train",
    "make_eval_step": "train",
    "CheckpointManager": "train",
    "restore_latest": "train",
    # eval
    "evaluate": "eval",
    "make_iwae_eval_step": "eval",
    "count_confusion": "eval",
    # data
    "load_data": "data",
    "make_synth_fn": "data",
    "synthesize_batch": "data",
    # parallel
    "make_mesh": "parallel",
    "shard_batch": "parallel",
    "make_shardmap_train_step": "parallel",
}

__all__ = sorted(_EXPORTS) + ["__version__"]


def __getattr__(name):
    submodule = _EXPORTS.get(name)
    if submodule is None:
        raise AttributeError(
            f"module {__name__!r} has no attribute {name!r}")
    import importlib

    mod = importlib.import_module(f"{__name__}.{submodule}")
    value = getattr(mod, name)
    globals()[name] = value  # cache: next access skips __getattr__
    return value


def __dir__():
    return __all__
