"""Data-parallel batched inference over a device mesh.

Multi-chip serving path: the global batch is sharded over the 'data'
axis, each chip runs the fused normalize+forward+sigmoid program on its
slice, outputs come back batch-sharded (jax keeps them distributed;
only consumers that pull to host pay a gather).  For the 257K-param
Segment model parameters are replicated — at this size weight
replication is free and avoids all collectives in the forward pass
(zero ICI traffic per step; scaling is embarrassingly parallel).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from instancesegmentation_tpu.parallel.mesh import make_mesh


class ParallelInferenceEngine:
    """Shard-batched whole-image inference (see infer.pipeline for the
    single-chip engine; instance mode composes the same way)."""

    def __init__(
        self,
        variables: dict,
        in_channels: int = 3,
        size: int = 512,
        dtype=jnp.bfloat16,
        num_devices: Optional[int] = None,
        threshold: float = 0.5,
        fused_stem: bool = False,
        quant: Optional[dict] = None,
        quant_mode: str = "int8_mxu",
    ):
        from instancesegmentation_tpu.models.segment import Segment

        self.mesh = make_mesh(num_devices)
        self.n = self.mesh.devices.size
        self.size = size
        self.in_channels = in_channels
        self.threshold = threshold
        self._dtype = dtype
        # 20-channel gate mirrors InferenceEngine: fold_stem_hm is
        # derived for the 3+17 conditioned layout only
        self._fused_stem = fused_stem and in_channels == 20
        self._quant = quant
        self.model = Segment(
            in_channels=in_channels, dtype=dtype,
            quant_mode=quant_mode if quant is not None else "off",
        )
        self._batch_sharding = NamedSharding(self.mesh, P("data"))
        self.variables = variables  # property: folds head + builds program

    @property
    def variables(self) -> dict:
        return self._variables

    @variables.setter
    def variables(self, variables: dict) -> None:
        """Assigning weights replicates them over the mesh, refolds the
        head, and rebuilds the jitted program — the folded constants can
        never go stale against the backbone weights."""
        if self._quant is not None:
            variables = {**variables, "quant": self._quant}
        self._variables = jax.device_put(
            variables, NamedSharding(self.mesh, P())
        )
        self._build_program()

    def _build_program(self) -> None:
        # same fused serving programs as the single-chip engine
        # (infer/pipeline.py): compute-dtype normalize + truncated
        # backbone + algebraically folded section-6 head, plus the full
        # fused instance program (crop-warp + heatmaps + forward +
        # inverse warp).  Fold ONCE per weight assignment; the programs
        # close over the small FoldedHead constants.
        from instancesegmentation_tpu.infer.pipeline import (
            build_instance_forward,
        )
        from instancesegmentation_tpu.models.fused_head import fold_head

        dtype = self._dtype
        in_channels = self.in_channels
        head = fold_head(self._variables["params"])
        stem_fold = None
        if self._fused_stem and self._variables.get("batch_stats"):
            from instancesegmentation_tpu.models.fused_stem_hm import fold_stem_hm

            stem_fold = fold_stem_hm(self._variables)
        apply_model, self._forward_instance = build_instance_forward(
            self.model, in_channels, self.size, dtype, head,
            stem_fold=stem_fold, variables=self._variables,
        )

        @jax.jit
        def forward(images_u8):
            x = images_u8.astype(dtype) / jnp.asarray(127.5, dtype) - 1.0
            if in_channels > 3:
                hm = jnp.zeros(x.shape[:3] + (in_channels - 3,), x.dtype)
                logits = apply_model(x, hm)
            else:
                logits = apply_model(x)
            return jax.nn.sigmoid(logits)

        self._forward = forward

    def __call__(self, images_u8) -> jax.Array:
        """images_u8 [B, S, S, 3] -> probs [B, S, S, 1], batch-sharded
        across chips.

        Batches not divisible by the mesh size are zero-padded up to the
        next multiple so every shard gets an equal slice (static shapes
        for XLA); the padded rows are sliced off the result.
        """
        import numpy as np

        images_u8 = np.asarray(images_u8)
        b = images_u8.shape[0]
        pad = (-b) % self.n
        if pad:
            images_u8 = np.concatenate(
                [images_u8, np.zeros((pad,) + images_u8.shape[1:], images_u8.dtype)]
            )
        images = jax.device_put(jnp.asarray(images_u8), self._batch_sharding)
        probs = self._forward(images)
        return probs[:b] if pad else probs

    def predict_instances(self, batch: dict):
        """Instance mode over a host batch, mesh-sharded on the batch
        axis — same contract as the single-chip
        InferenceEngine.predict_instances, so instance-mode serving
        (infer/server.py submit_instance) can drive a whole mesh
        unchanged.  The bucket floor is the mesh size so every chip
        always receives an equal, non-empty slice.
        """
        from instancesegmentation_tpu.infer.pipeline import (
            InferenceEngine,
            run_instance_batch,
        )

        def put(arrays):
            return [
                jax.device_put(a, self._batch_sharding) for a in arrays
            ]

        return run_instance_batch(
            self._forward_instance, batch, self.threshold,
            InferenceEngine._bucket_size, min_bucket=self.n, put=put,
        )

    def predict_images(self, images):
        """Same contract as the single-chip engine (infer.pipeline
        InferenceEngine.predict_images): list of RGB uint8 at arbitrary
        resolutions -> list of 0/255 uint8 masks at the original
        resolutions — so the dynamic-batching ServingFrontend
        (infer/server.py) can drive a whole mesh unchanged.  Shares the
        resize/bucket/threshold surface with the single-chip engine
        (min_bucket = the mesh size, a mesh multiple for 2^k meshes)."""
        from instancesegmentation_tpu.infer.pipeline import (
            predict_masks_batched,
        )

        return predict_masks_batched(
            self, images, self.size, self.threshold, min_bucket=self.n
        )
