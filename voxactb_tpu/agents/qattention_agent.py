"""QAttention BC agent: the YARR-contract wrapper around the fused device programs.

Counterpart of ``QAttentionPerActBCAgent`` (qattention_peract_bc_agent.py:138-880) and
the decode half of ``QAttentionStackAgent`` (qattention_stack_agent.py:46-98). PerAct
uses a single depth layer, so the "stack" collapses to: run the fused infer program,
then assemble host-side ActResult fields. All math (voxelize, forward, softmax/argmax,
discrete-euler -> quaternion, world-coordinate decode) already happened on device inside
``make_infer_fn`` — the only host work is dict plumbing and the per-camera pixel-coord
projection for summaries (qattention_stack_agent.py:68-76).
"""

from __future__ import annotations

import os
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from voxactb_tpu.agents.base import ActResult, Agent, ScalarSummary, Summary
from voxactb_tpu.agents.qfunction import (
    InferOutput,
    TrainState,
    make_infer_fn,
    make_optimizer,
    make_train_step,
)
from voxactb_tpu.config import MethodConfig
from voxactb_tpu.utils.observation import point_to_pixel_index

NAME = "QAttentionAgent"


def _with_batch(x, event_ndim: int, dtype=np.float32):
    """Reshape to [1, *event_shape] regardless of incoming batch dims."""
    a = np.asarray(x, dtype)
    return a.reshape((1,) + a.shape[a.ndim - event_ndim:])


class QAttentionBCAgent(Agent):
    """Single Q-attention layer agent (depth 0 — the only depth PerAct uses).

    Language: ``lang_encoder`` maps token ids -> (lang_goal_emb [1,1024],
    lang_token_embs [1,77,512]); pass the CLIP-RN50 JAX encoder
    (voxactb_tpu.models.clip_text) or leave None to read precomputed embeddings from
    the observation (the replay path stores them at fill time, launch_utils.py:384-400).
    """

    def __init__(
        self,
        cfg: MethodConfig,
        camera_names: Sequence[str],
        scene_bounds: Sequence[float],
        batch_size: int = 1,
        training_iterations: int = 1_000_000,
        lang_encoder: Optional[Callable] = None,
        layer: int = 0,
    ):
        self._cfg = cfg
        self._camera_names = list(camera_names)
        self._scene_bounds = np.asarray(scene_bounds, np.float32)
        self._batch_size = batch_size
        self._training_iterations = training_iterations
        self._lang_encoder = lang_encoder
        self._layer = layer
        self._name = f"{NAME}_layer{layer}"
        self._state: Optional[TrainState] = None
        self._params = None
        self._pending_opt = None
        self._summaries: Dict[str, float] = {}
        self._rng = jax.random.key(0)

    # -- lifecycle -----------------------------------------------------------------

    def build(self, training: bool, device=None) -> None:
        self._training = training
        if training:
            self._optimizer = make_optimizer(self._cfg, self._training_iterations)
            self._model, self._init_fn, self._train_step = make_train_step(
                self._cfg, self._optimizer, self._camera_names
            )
        self._model, self._infer = make_infer_fn(self._cfg)

    def _ensure_state(self, example_batch) -> None:
        if self._state is None:
            self._state = self._init_fn(jax.random.key(0), example_batch)
            if self._params is not None:
                # weights were loaded before the first update -> keep them
                self._state = self._state.replace(params=self._params)
            if self._pending_opt is not None:
                # resume: the checkpoint's optimizer state/step were loaded
                # before any state existed (OfflineTrainRunner restores BEFORE
                # the first update) — dropping them would restart the LAMB
                # moments, the LR schedule, and the fold_in(rng, step)
                # augmentation stream from step 0
                step, opt_sd = self._pending_opt
                restored = serialization.from_state_dict(
                    self._state.opt_state, opt_sd)
                self._state = TrainState(
                    jnp.asarray(step, jnp.int32), self._state.params, restored)
                self._pending_opt = None
            self._params = self._state.params

    # -- training ------------------------------------------------------------------

    def update(self, step: int, replay_sample: dict) -> dict:
        batch = {k: jnp.asarray(v) for k, v in replay_sample.items()
                 if isinstance(v, (np.ndarray, jnp.ndarray, list, float, int))}
        if "scene_bounds" not in batch:
            batch["scene_bounds"] = jnp.asarray(self._scene_bounds)
        self._ensure_state(batch)
        self._state, metrics = self._train_step(self._state, batch, self._rng)
        self._params = self._state.params
        self._summaries = {f"losses/{k}": v for k, v in metrics.items()}
        return {"total_loss": metrics["total_loss"]}

    # -- inference -----------------------------------------------------------------

    def act(self, step: int, observation: dict, deterministic: bool = False,
            which_arm: Optional[str] = None, new_scene_bounds=None,
            dominant_assitive_policy: bool = False, ep_number: int = 0,
            is_real_robot: bool = False) -> ActResult:
        bounds = (
            np.asarray(new_scene_bounds, np.float32)
            if new_scene_bounds is not None else self._scene_bounds
        ).reshape(1, 6)

        # language conditioning (qattention_peract_bc_agent.py:653-665)
        if "lang_goal_emb" in observation:
            lang_goal = _with_batch(observation["lang_goal_emb"], 1)
            lang_tok = _with_batch(observation["lang_token_embs"], 2)
        else:
            key = {
                "multiarm_left": "lang_goal_tokens_left",
                "multiarm_right": "lang_goal_tokens_right",
            }.get(which_arm, "lang_goal_tokens")
            tokens = np.asarray(observation[key]).reshape(1, -1)
            if self._lang_encoder is None:
                raise ValueError(
                    "observation has raw lang tokens but no lang_encoder was given"
                )
            lang_goal, lang_tok = self._lang_encoder(tokens)

        # proprio selection by arm mode (:672-681)
        if dominant_assitive_policy:
            left = np.asarray(observation["low_dim_state_left_arm"], np.float32)
            right = np.asarray(observation["low_dim_state_right_arm"], np.float32)
            proprio = np.concatenate([left.reshape(1, -1)[:, :3],
                                      right.reshape(1, -1)], -1)
        elif which_arm in ("right", "multiarm_right"):
            proprio = np.asarray(
                observation["low_dim_state_right_arm"], np.float32).reshape(1, -1)
        elif which_arm in ("left", "multiarm_left"):
            proprio = np.asarray(
                observation["low_dim_state_left_arm"], np.float32).reshape(1, -1)
        elif self._cfg.variant == "one_policy_more_heads" \
                and "low_dim_state_right_arm" in observation:
            # two-head proprio = right(4) then left(4) per-arm states — the
            # env's combined low_dim_state uses the dominant layout instead
            w = self._cfg.low_dim_size()
            proprio = np.concatenate([
                np.asarray(observation["low_dim_state_right_arm"],
                           np.float32).reshape(1, -1)[:, :w],
                np.asarray(observation["low_dim_state_left_arm"],
                           np.float32).reshape(1, -1)[:, :w]], -1)
        else:
            proprio = np.asarray(observation["low_dim_state"], np.float32).reshape(1, -1)
        # envs may carry extra trailing channels (e.g. the arm-id slot) that a given
        # arm-mode config doesn't consume — keep exactly the configured width
        proprio = proprio[:, : self._cfg.proprio_width()]

        rgbs = tuple(
            np.asarray(observation[f"{c}_rgb"], np.float32).reshape(
                1, *np.asarray(observation[f"{c}_rgb"]).shape[-3:]
            )
            for c in self._camera_names
        )
        pcds = tuple(
            np.asarray(observation[f"{c}_point_cloud"], np.float32).reshape(
                1, *np.asarray(observation[f"{c}_point_cloud"]).shape[-3:]
            )
            for c in self._camera_names
        )

        if self._params is None:
            # fresh (untrained) evaluation — initialize weights lazily
            n = self._cfg.voxel_size
            self._params = self._model.init(
                jax.random.key(0),
                jnp.zeros((1, n, n, n, 10), jnp.float32),
                jnp.asarray(proprio), jnp.asarray(lang_goal), jnp.asarray(lang_tok),
            )

        out: InferOutput = self._infer(
            self._params, rgbs, pcds, proprio, lang_goal, lang_tok, bounds
        )

        # single device->host transfer for the whole action
        trans_idx = np.asarray(out.trans_idx)
        rot_grip = np.asarray(out.rot_grip_idx)
        collision = np.asarray(out.collision_idx)
        att = np.asarray(out.attention_coordinate)
        cont = np.asarray(out.continuous_action)

        if self._cfg.variant == "one_policy_more_heads":
            # match by arm suffix: the multiarm rollout passes
            # 'multiarm_right'/'multiarm_left' (rollout.py), which must route
            # to the same heads as plain 'right'/'left'
            head = 0 if which_arm in ("right", "multiarm_right", None) else 1
            trans_idx, rot_grip = trans_idx[head], rot_grip[head]
            collision, att, cont = collision[head], att[head], cont[head]

        observation_elements = {
            "attention_coordinate": att[0],
            "attention_coordinate_layer_0": att[0],
            "trans_action_indicies": trans_idx[0],
            "rot_grip_action_indicies": rot_grip[0],
        }
        # per-camera attention pixel coordinates (qattention_stack_agent.py:68-76)
        if not is_real_robot:
            for cam in self._camera_names:
                ek, ik = f"{cam}_camera_extrinsics", f"{cam}_camera_intrinsics"
                if ek in observation and ik in observation:
                    px, py = point_to_pixel_index(
                        att[0],
                        np.asarray(observation[ek]).reshape(4, 4),
                        np.asarray(observation[ik]).reshape(3, 3),
                    )
                    observation_elements[f"{cam}_pixel_coord"] = [py, px]

        info = {
            "voxel_grid_depth0": out.voxel_grid,
            "q_depth0": out.q_trans,
            "voxel_idx_depth0": trans_idx,
            # points the fused front kernel dropped past its row capacity
            # (0 on the XLA path / ordinary clouds; nonzero = the voxel grid
            # diverged from reference scatter semantics, voxel_grid.py:106-127)
            "front_overflow": int(np.asarray(out.front_overflow).sum()),
        }

        if is_real_robot:
            # (position, quaternion, grip) tuple, qattention_stack_agent.py:91-92
            return ActResult(
                (cont[0, :3], cont[0, 3:7], cont[0, 7:8]),
                observation_elements=observation_elements, info=info,
            )
        return ActResult(cont[0], observation_elements=observation_elements, info=info)

    # -- summaries / weights ---------------------------------------------------------

    def update_summaries(self) -> List[Summary]:
        return [ScalarSummary(f"{self._name}/{k}", float(v))
                for k, v in self._summaries.items()]

    def act_summaries(self) -> List[Summary]:
        return []

    def _ckpt_path(self, savedir: str) -> str:
        return os.path.join(savedir, f"{self._name}.msgpack")

    def save_weights(self, savedir: str) -> None:
        os.makedirs(savedir, exist_ok=True)
        payload = {
            "params": serialization.to_state_dict(self._params),
            "step": 0 if self._state is None else int(self._state.step),
        }
        if self._state is not None:
            payload["opt_state"] = serialization.to_state_dict(self._state.opt_state)
        with open(self._ckpt_path(savedir), "wb") as f:
            f.write(serialization.msgpack_serialize(
                jax.tree.map(np.asarray, payload)))

    def load_weights(self, savedir: str) -> None:
        self.load_weight(self._ckpt_path(savedir))

    def load_weight(self, ckpt_file: str) -> None:
        with open(ckpt_file, "rb") as f:
            payload = serialization.msgpack_restore(f.read())
        self._params = (
            serialization.from_state_dict(self._params, payload["params"])
            if self._params is not None else payload["params"]
        )
        if self._training and "opt_state" in payload:
            if self._state is not None:
                restored_opt = serialization.from_state_dict(
                    self._state.opt_state, payload["opt_state"]
                )
                self._state = TrainState(
                    jnp.asarray(payload.get("step", 0), jnp.int32),
                    self._params, restored_opt,
                )
            else:
                # no TrainState yet (resume path loads before the first
                # update): stash and restore inside _ensure_state
                self._pending_opt = (payload.get("step", 0),
                                     payload["opt_state"])

    @property
    def params(self):
        return self._params

    @params.setter
    def params(self, p):
        self._params = p
