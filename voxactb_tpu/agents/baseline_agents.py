"""Agent wrappers for the baseline policy zoo.

Counterparts of ``BCLangAgent`` (baselines/bc_lang/bc_lang_agent.py:34 — MSE
regression of the continuous action), the ViT variant (vit_bc_lang) and the
C2FARM LingUNet BC Q-attention agent (c2farm_lingunet_bc). Same Agent contract as
QAttentionBCAgent; the update/act programs are fused jits like the main agent's.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization

from voxactb_tpu.agents.base import ActResult, Agent, ScalarSummary
from voxactb_tpu.agents.qfunction import TrainState, normalize_rgb
from voxactb_tpu.models.baselines import CnnLangPolicy, ViTLangPolicy


class BCLangAgent(Agent):
    """Direct-regression BC over camera features + language + proprio.

    ``network='cnn'`` or ``'vit'``. Trains with MSE on the 8-DoF continuous action
    (the reference's loss), acts by emitting the regressed action directly.
    """

    def __init__(self, camera_names: Sequence[str], network: str = "cnn",
                 lr: float = 1e-3, name: str = "BCLangAgent", **net_kw):
        self._cameras = list(camera_names)
        self._net = (CnnLangPolicy(**net_kw) if network == "cnn"
                     else ViTLangPolicy(**net_kw))
        self._lr = lr
        self._name = name
        self._state: Optional[TrainState] = None
        self._params = None
        self._summaries: Dict[str, float] = {}

    def build(self, training: bool, device=None) -> None:
        self._training = training
        self._optimizer = optax.adam(self._lr)

        def loss_fn(params, rgbs, pcds, proprio, lang, target):
            pred = self._net.apply(params, rgbs, pcds, proprio, lang)
            return jnp.mean((pred - target) ** 2)

        @jax.jit
        def train_step(state, rgbs, pcds, proprio, lang, target):
            loss, grads = jax.value_and_grad(loss_fn)(
                state.params, rgbs, pcds, proprio, lang, target)
            updates, opt_state = self._optimizer.update(
                grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return TrainState(state.step + 1, params, opt_state), loss

        self._train_step = train_step
        self._infer = jax.jit(self._net.apply)

    def _inputs(self, sample, key_rgb="_rgb", key_pcd="_point_cloud"):
        rgbs = [normalize_rgb(jnp.asarray(sample[f"{c}{key_rgb}"], jnp.float32))
                for c in self._cameras]
        pcds = [jnp.asarray(sample[f"{c}{key_pcd}"], jnp.float32)
                for c in self._cameras]
        return rgbs, pcds

    def update(self, step: int, replay_sample: dict) -> dict:
        rgbs, pcds = self._inputs(replay_sample)
        proprio = jnp.asarray(replay_sample["low_dim_state"], jnp.float32)
        lang = jnp.asarray(replay_sample["lang_goal_emb"], jnp.float32)
        pose = jnp.asarray(replay_sample["gripper_pose"], jnp.float32)
        grip = jnp.asarray(
            replay_sample["rot_grip_action_indicies"], jnp.float32)[:, 3:4]
        target = jnp.concatenate([pose, grip], -1)
        if self._state is None:
            params = self._net.init(jax.random.key(0), rgbs, pcds, proprio, lang)
            self._state = TrainState(jnp.zeros((), jnp.int32), params,
                                     self._optimizer.init(params))
        self._state, loss = self._train_step(
            self._state, rgbs, pcds, proprio, lang, target)
        self._params = self._state.params
        self._summaries = {"losses/mse": float(np.asarray(loss))}
        return {"total_loss": loss}

    def act(self, step: int, observation: dict, deterministic: bool = False,
            which_arm: Optional[str] = None, **kw) -> ActResult:
        rgbs, pcds = self._inputs(observation)
        key = {"right": "low_dim_state_right_arm",
               "left": "low_dim_state_left_arm"}.get(which_arm, "low_dim_state")
        proprio = jnp.asarray(observation[key], jnp.float32).reshape(1, -1)[:, :4]
        lang = jnp.asarray(observation["lang_goal_emb"],
                           jnp.float32).reshape(1, -1)
        if self._params is None:
            self._params = self._net.init(
                jax.random.key(0), rgbs, pcds, proprio, lang)
        pred = np.asarray(self._infer(self._params, rgbs, pcds, proprio, lang))[0]
        action = np.concatenate([pred, [1.0]])  # + ignore_collisions bit
        return ActResult(action)

    def update_summaries(self) -> List:
        return [ScalarSummary(f"{self._name}/{k}", v)
                for k, v in self._summaries.items()]

    def save_weights(self, savedir: str) -> None:
        os.makedirs(savedir, exist_ok=True)
        with open(os.path.join(savedir, f"{self._name}.msgpack"), "wb") as f:
            f.write(serialization.msgpack_serialize(
                serialization.to_state_dict(self._params)))

    def load_weights(self, savedir: str) -> None:
        with open(os.path.join(savedir, f"{self._name}.msgpack"), "rb") as f:
            restored = serialization.msgpack_restore(f.read())
        self._params = (serialization.from_state_dict(self._params, restored)
                        if self._params is not None else restored)
