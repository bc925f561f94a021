"""Self-MM's Feature / Center / Label banks, as a functional pytree.

Reference: experiment_utils/managers.py:11-279 — device-resident stores of
per-sample embeddings (FeatureManager), pos/neg class centers
(CenterManager), and per-modality self-generated labels (LabelManager).

TPU-native inversion: the three managers become one immutable `ManagerState`
pytree threaded through the jitted Self-MM train step; updates are
`.at[idx].set(...)` scatters and masked means — no Python-side mutation, so
the whole label-refinement algorithm compiles into the step.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from flax import struct

MULTIMODAL = "multimodal"


class ManagerState(struct.PyTreeNode):
    features: Dict[str, jnp.ndarray]      # modality → (N, D)
    labels: Dict[str, jnp.ndarray]        # modality → (N,)
    centers_pos: Dict[str, jnp.ndarray]   # modality → (D,)
    centers_neg: Dict[str, jnp.ndarray]   # modality → (D,)

    @classmethod
    def create(
        cls, num_samples: int, modality_dims: Dict[str, int]
    ) -> "ManagerState":
        return cls(
            features={
                m: jnp.zeros((num_samples, d), jnp.float32)
                for m, d in modality_dims.items()
            },
            labels={m: jnp.zeros((num_samples,), jnp.float32) for m in modality_dims},
            centers_pos={
                m: jnp.zeros((d,), jnp.float32) for m, d in modality_dims.items()
            },
            centers_neg={
                m: jnp.zeros((d,), jnp.float32) for m, d in modality_dims.items()
            },
        )

    # -- label bank ---------------------------------------------------------

    def init_labels(self, indexes: jnp.ndarray, labels: jnp.ndarray) -> "ManagerState":
        new = {
            m: bank.at[indexes].set(labels.astype(jnp.float32))
            for m, bank in self.labels.items()
        }
        return self.replace(labels=new)

    def get_labels(self, modality: str, indexes: jnp.ndarray) -> jnp.ndarray:
        return self.labels[modality][indexes]

    def update_labels(
        self,
        modality: str,
        indexes: jnp.ndarray,
        new_labels: jnp.ndarray,
        sample_mask: jnp.ndarray = None,
    ) -> "ManagerState":
        """Scatter via masked DELTA-add: padded rows alias sample 0 and
        duplicate-index `.set` order is unspecified — a zero delta for
        masked-out rows makes the scatter exact."""
        old = self.labels[modality][indexes]
        delta = new_labels - old
        if sample_mask is not None:
            delta = jnp.where(sample_mask > 0, delta, 0.0)
        bank = self.labels[modality].at[indexes].add(delta)
        return self.replace(labels={**self.labels, modality: bank})

    # -- feature bank ---------------------------------------------------------

    def update_features(
        self,
        features: Dict[str, jnp.ndarray],
        indexes: jnp.ndarray,
        sample_mask: jnp.ndarray = None,
    ) -> "ManagerState":
        new = dict(self.features)
        for m, f in features.items():
            delta = jax.lax.stop_gradient(f) - new[m][indexes]
            if sample_mask is not None:
                # padded rows alias sample 0 — zero delta leaves them intact
                delta = jnp.where(sample_mask[:, None] > 0, delta, 0.0)
            new[m] = new[m].at[indexes].add(delta)
        return self.replace(features=new)

    # -- centers -----------------------------------------------------------------

    def update_centers(self, exclude_zero: bool = True) -> "ManagerState":
        """Pos/neg centers = masked means over the full feature bank.

        Faithful quirk (reference self_mm.py:421-424 + managers.py:137-160):
        `_update_centers` calls CenterManager.update once per modality in
        [multimodal, audio, video, text] order, and EACH call overwrites
        EVERY modality's centers with that iteration's label mask — so
        after the loop all centers are keyed by the LAST modality's (text)
        labels, not each modality's own. Reproduced exactly; a per-modality
        labels version would diverge from the reference's label-refinement
        trajectory."""
        order = [
            m for m in ("multimodal", "audio", "video", "text")
            if m in self.labels
        ] or list(self.labels)
        last_labels = self.labels[order[-1]]
        pos_new, neg_new = dict(self.centers_pos), dict(self.centers_neg)
        for m, feats in self.features.items():
            labels = last_labels
            pos_mask = (labels > 0) if exclude_zero else (labels >= 0)
            neg_mask = labels < 0
            pos_cnt = jnp.sum(pos_mask)
            neg_cnt = jnp.sum(neg_mask)
            pos_mean = jnp.sum(
                feats * pos_mask[:, None], axis=0
            ) / jnp.maximum(pos_cnt, 1)
            neg_mean = jnp.sum(
                feats * neg_mask[:, None], axis=0
            ) / jnp.maximum(neg_cnt, 1)
            pos_new[m] = jnp.where(pos_cnt > 0, pos_mean, self.centers_pos[m])
            neg_new[m] = jnp.where(neg_cnt > 0, neg_mean, self.centers_neg[m])
        return self.replace(centers_pos=pos_new, centers_neg=neg_new)


# Config-side stand-ins for the YAML tags (!FeatureManager etc.): the
# reference constructs live manager objects at parse time; here the tags
# carry the modality_dims spec the trainer uses to size ManagerState.
class FeatureManager(dict):
    def __init__(self, modality_dims=None, device=None, **kwargs):
        super().__init__(modality_dims=modality_dims or kwargs)


class CenterManager(dict):
    def __init__(self, modality_dims=None, device=None, exclude_zero=True, **kwargs):
        super().__init__(
            modality_dims=modality_dims or kwargs, exclude_zero=exclude_zero
        )


class LabelManager(dict):
    def __init__(self, modality_dims=None, device=None, **kwargs):
        super().__init__(modality_dims=modality_dims or kwargs)
