"""Train-CLI coverage: every zoo method launches from the command line
(reference: one Hydra config per model, `configs/model/*.yaml`; VERDICT r1
item 9)."""

import numpy as np
import pytest

from rl4co_tpu.train import MODEL_NAMES, WorkloadSpec, build
from rl4co_tpu.trainer import Trainer


def tiny_spec(model, **kw):
    base = dict(
        env_name="tsp",
        env_kwargs=(("num_loc", 6),),
        model=model,
        epochs=1,
        batch_size=4,
        train_data_size=8,
        val_data_size=4,
        baseline="mean",
        precision="f32",
    )
    base.update(kw)
    return WorkloadSpec(**base)


# per-model overrides keeping the smoke tests tiny
SMOKE_OVERRIDES = {
    "am": {},
    "am-xl": {},
    "pomo": {},
    "symnco": {},
    "ppo": {},
    "a2c": {},
    "polynet": {"policy_kwargs": (("k", 2),)},
    "deepaco": {},
    "gfacs": {},
    "mdam": {"policy_kwargs": (("num_paths", 2), ("embed_dim", 16),
                               ("num_encoder_layers", 1), ("num_heads", 2),
                               ("feedforward_hidden", 16))},
    "ptrnet": {"policy_kwargs": (("embed_dim", 16), ("hidden_dim", 16))},
    "ham": {"env_name": "pdp", "policy_kwargs": (("embed_dim", 16),
                                                 ("num_encoder_layers", 1),
                                                 ("num_heads", 2))},
    "matnet": {"env_name": "atsp", "policy_kwargs": (("embed_dim", 16),
                                                     ("num_encoder_layers", 1),
                                                     ("num_heads", 2))},
    "mvmoe": {"policy_kwargs": (("embed_dim", 16), ("num_encoder_layers", 1),
                                ("num_heads", 2), ("num_experts", 2))},
    "mvmoe-pomo": {"policy_kwargs": (("embed_dim", 16),
                                     ("num_encoder_layers", 1),
                                     ("num_heads", 2), ("num_experts", 2))},
    "l2d": {"policy_kwargs": (("embed_dim", 16), ("num_encoder_layers", 1),
                              ("actor_hidden_dim", 16))},
    "l2d-attn": {"policy_kwargs": (("embed_dim", 16), ("num_heads", 2),
                                   ("num_encoder_layers", 1))},
    "l2d-ppo": {"policy_kwargs": (("embed_dim", 16), ("num_encoder_layers", 1),
                                  ("actor_hidden_dim", 16))},
    "dact": {"policy_kwargs": (("embed_dim", 16), ("num_heads", 2),
                               ("num_encoder_layers", 1),
                               ("feedforward_hidden", 16))},
    "n2s": {"policy_kwargs": (("embed_dim", 16), ("num_heads", 2),
                              ("num_encoder_layers", 1))},
    "neuopt": {"policy_kwargs": (("embed_dim", 16), ("num_heads", 2),
                                 ("num_encoder_layers", 1))},
    # covered in depth by tests/test_multi_env.py (needs a comma env list)
    "am-multienv": None,
}


def test_every_model_name_has_a_smoke_override():
    assert set(SMOKE_OVERRIDES) == set(MODEL_NAMES)


@pytest.mark.parametrize(
    "model", sorted(m for m, ov in SMOKE_OVERRIDES.items() if ov is not None)
)
def test_build_and_train_one_epoch(model):
    spec = tiny_spec(model, **SMOKE_OVERRIDES[model])
    algo, trainer = build(spec, logger=lambda m: None)
    # shrink the improvement trio's horizons for the smoke test
    if model in ("dact", "n2s", "neuopt"):
        import dataclasses

        algo = dataclasses.replace(algo, n_step=2, T_train=2, T_test=4,
                                   ppo_epochs=1)
        trainer = Trainer(algo, trainer.config, logger=lambda m: None)
    state = trainer.fit()
    rec = trainer.history[-1]
    val = rec.get("val/reward")
    assert val is not None and np.isfinite(float(val)), rec
