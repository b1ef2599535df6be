"""Translational KG-embedding towers: TransE / TransH / TransR / TransD.

Reference: recstudio/model/kg/KGLearning.py:6-206. Functional re-design: each
tower is a parameter-dict factory plus pure scoring functions that parent
recommenders (CKE / KTUP / CFKG) call inside their jitted steps. The triplet
objective is the corrupt-tail (optionally corrupt-head) hinge/BPR contract
with uniform entity negatives.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ...ann.sampler import UniformSampler
from ..scorer import EuclideanScorer, NormScorer


class TransETower:
    """h + r ≈ t under a negative p-norm score."""

    def __init__(self, config: Dict, num_entities: int, num_relations: int):
        self.embed_dim = config["model"]["embed_dim"]
        self.margin = config["model"].get("margin", 2)
        self.normalize = config["model"].get("normalize", False)
        self.p = config["model"].get("p", 2)
        self.num_entities = num_entities
        self.num_relations = num_relations
        self.score_func = NormScorer(self.p)
        self.sampler = UniformSampler(num_entities)

    def init_params(self, rng) -> Dict[str, jax.Array]:
        k1, k2 = jax.random.split(rng)
        d = self.embed_dim
        ent = 0.02 * jax.random.normal(k1, (self.num_entities, d))
        rel = 0.02 * jax.random.normal(k2, (self.num_relations, d))
        return {"ent_embedding": ent.at[0].set(0.0), "rel_embedding": rel.at[0].set(0.0)}

    def project(self, params, entities, relations):
        return params["ent_embedding"][entities]

    def embed_rel(self, params, relations):
        return params["rel_embedding"][relations]

    def triplet_scores(self, params, rng, heads, relations, tails, neg_count: int):
        """Returns the pairwise-loss score dict for corrupt-tail triplets."""
        h = self.project(params, heads, relations)
        t = self.project(params, tails, relations)
        r = self.embed_rel(params, relations)
        if self.normalize:
            nrm = lambda x: x * jax.lax.rsqrt(jnp.sum(x * x, -1, keepdims=True) + 1e-12)
            h, r, t = nrm(h), nrm(r), nrm(t)
        pos_score = self.score_func(h + r, t)
        log_pos, neg_t, log_neg = self.sampler((), rng, h + r, neg_count,
                                               pos_items=tails)
        neg_t_e = self.project(params, neg_t, relations)
        if self.normalize:
            neg_t_e = neg_t_e * jax.lax.rsqrt(
                jnp.sum(neg_t_e * neg_t_e, -1, keepdims=True) + 1e-12)
        neg_score = self.score_func(h + r, neg_t_e)
        return {"pos_score": pos_score, "log_pos_prob": log_pos,
                "neg_score": neg_score, "log_neg_prob": log_neg}


class TransHTower(TransETower):
    """Projects entities onto relation-specific hyperplanes."""

    def __init__(self, config, num_entities, num_relations):
        super().__init__(config, num_entities, num_relations)
        self.score_func = EuclideanScorer()

    def init_params(self, rng):
        params = super().init_params(rng)
        k = jax.random.fold_in(rng, 7)
        norm = 0.02 * jax.random.normal(k, (self.num_relations, self.embed_dim))
        params["norm_embedding"] = norm.at[0].set(0.0)
        return params

    def project(self, params, entities, relations):
        e = params["ent_embedding"][entities]
        w = params["norm_embedding"][relations]
        if e.ndim > w.ndim:
            w = w[..., None, :]
        return e - jnp.sum(e * w, axis=-1, keepdims=True) * w

    def orthogonal_loss(self, params, relations):
        r = params["rel_embedding"][relations]
        w = params["norm_embedding"][relations]
        return jnp.sum(jnp.sum(w * r, axis=1) ** 2 / jnp.sum(r ** 2, axis=1))


class TransRTower(TransETower):
    """Relation-specific projection matrices into a pro_embed_dim space."""

    def __init__(self, config, num_entities, num_relations):
        super().__init__(config, num_entities, num_relations)
        self.pro_embed_dim = config["model"]["pro_embed_dim"]
        self.score_func = EuclideanScorer()

    def init_params(self, rng):
        k1, k2, k3 = jax.random.split(rng, 3)
        d, pd = self.embed_dim, self.pro_embed_dim
        return {
            "ent_embedding": (0.02 * jax.random.normal(k1, (self.num_entities, d))).at[0].set(0.0),
            "rel_embedding": (0.02 * jax.random.normal(k2, (self.num_relations, pd))).at[0].set(0.0),
            "pro_embedding": (0.02 * jax.random.normal(k3, (self.num_relations, d * pd))).at[0].set(0.0),
        }

    def project(self, params, entities, relations):
        e = params["ent_embedding"][entities]
        squeeze = e.ndim == 2
        if squeeze:
            e = e[:, None, :]
        pro = params["pro_embedding"][relations].reshape(-1, self.embed_dim,
                                                         self.pro_embed_dim)
        out = jnp.einsum("bnd,bdp->bnp", e, pro)
        return out[:, 0, :] if squeeze else out


class TransDTower(TransETower):
    """Dynamic projection from entity/relation projection vectors."""

    def __init__(self, config, num_entities, num_relations):
        super().__init__(config, num_entities, num_relations)
        self.pro_embed_dim = config["model"]["pro_embed_dim"]
        self.score_func = EuclideanScorer()

    def init_params(self, rng):
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        d, pd = self.embed_dim, self.pro_embed_dim
        return {
            "ent_embedding": (0.02 * jax.random.normal(k1, (self.num_entities, d))).at[0].set(0.0),
            "rel_embedding": (0.02 * jax.random.normal(k2, (self.num_relations, pd))).at[0].set(0.0),
            "ent_pro_embedding": (0.02 * jax.random.normal(k3, (self.num_entities, d))).at[0].set(0.0),
            "rel_pro_embedding": (0.02 * jax.random.normal(k4, (self.num_relations, pd))).at[0].set(0.0),
        }

    def project(self, params, entities, relations):
        if hasattr(entities, "ndim") and entities.ndim > relations.ndim:
            relations = relations[..., None]
        ent_p = params["ent_pro_embedding"][entities]        # [..., d]
        rel_p = params["rel_pro_embedding"][relations]       # [..., pd]
        pro = rel_p[..., :, None] * ent_p[..., None, :]      # [..., pd, d]
        eye = jnp.eye(self.pro_embed_dim, self.embed_dim)
        pro = pro + eye
        e = params["ent_embedding"][entities][..., :, None]  # [..., d, 1]
        return jnp.matmul(pro, e)[..., 0]


TOWERS = {"TransE": TransETower, "TransH": TransHTower,
          "TransR": TransRTower, "TransD": TransDTower}
