"""Free-form deformation with Bernstein basis.

TPU-native re-expression of geometric/derender3d/models/transforms.py:10-99.
Everything is a pure function over precomputed arrays so it vmaps over padded
object slots (the reference instantiates one torch Module per mesh and loops).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy import special


@dataclasses.dataclass(frozen=True)
class Constraint:
    """FFD control-point constraint (transforms.py:11-35).

    kind: "symmetry" (mirror control grid along `axis`, negating that
    displacement component) or "homogeneity" (tie the non-`axis` displacement
    components of grid slices `index` along `axis` to their mean).
    """

    kind: str
    axis: int
    index: Tuple[int, ...] = ()

    @staticmethod
    def symmetry(axis: int) -> "Constraint":
        return Constraint(kind="symmetry", axis=axis)

    @staticmethod
    def homogeneity(axis: int, index: Sequence[int]) -> "Constraint":
        return Constraint(kind="homogeneity", axis=axis, index=tuple(index))


# The constraint set used by Derenderer3d for all car meshes
# (derender3d/models/__init__.py:60-63).
CAR_CONSTRAINTS = (
    Constraint.symmetry(axis=2),
    Constraint.homogeneity(axis=1, index=(0, 1)),
)


def make_ffd_basis(vertices: np.ndarray, num_grids: int = 4) -> Tuple[np.ndarray, np.ndarray]:
    """Precompute the Bernstein tensor-product basis.

    vertices: [V, 3] in [-0.5, 0.5] per axis (ShapeNet post-normalization).
    Returns (B [V, G, G, G], P0 [3, G, G, G]); transforms.py:51-66.
    """
    assert num_grids % 2 == 0
    grids = np.arange(num_grids)
    binoms = special.binom(num_grids - 1, grids).astype(np.float32)  # [G]
    v = vertices.astype(np.float32)  # [V, 3]
    # coeff[v, axis, g] = C(G-1,g) (0.5+x)^g (0.5-x)^(G-1-g)
    coeff = (
        binoms[None, None, :]
        * np.power(0.5 + v[:, :, None], grids[None, None, :])
        * np.power(0.5 - v[:, :, None], num_grids - 1 - grids[None, None, :])
    )
    B = np.einsum("ni,nj,nk->nijk", coeff[:, 0], coeff[:, 1], coeff[:, 2])
    mesh = np.stack(np.meshgrid(grids, grids, grids, indexing="ij"), axis=0)
    P0 = (mesh / (num_grids - 1) - 0.5).astype(np.float32)  # [3, G, G, G]
    return B.astype(np.float32), P0


def apply_constraints(dP: jnp.ndarray, constraints: Sequence[Constraint]) -> jnp.ndarray:
    """Project control-point displacements onto the constraint set.

    dP: [3, G, G, G] (component, gx, gy, gz); transforms.py:68-95.
    """
    for c in constraints:
        if c.kind == "symmetry":
            # the reference negates the z COMPONENT for every symmetry
            # axis (models/transforms.py:73-77), not the mirrored one
            flipped = jnp.flip(dP, axis=c.axis + 1).at[2].multiply(-1.0)
            dP = (dP + flipped) / 2.0
        elif c.kind == "homogeneity":
            grid_dim = c.axis + 1
            moved = jnp.moveaxis(dP, grid_dim, 0)  # [G, 3, G, G]
            sel = jnp.stack([moved[i] for i in c.index], axis=0)
            mean = jnp.mean(sel, axis=0)  # [3, G, G]
            new_slices = []
            G = dP.shape[grid_dim]
            for i in range(G):
                if i in c.index:
                    s = mean.at[c.axis].set(moved[i][c.axis])
                else:
                    s = moved[i]
                new_slices.append(s)
            dP = jnp.moveaxis(jnp.stack(new_slices, axis=0), 0, grid_dim)
        else:
            raise ValueError(f"unknown constraint kind {c.kind}")
    return dP


@jax.tree_util.register_pytree_node_class
class FFD:
    """Bernstein free-form deformation for one mesh.

    Precomputed basis B [V, G^3] and control grid P0 [3, G^3] are pytree
    leaves so an [N_mesh, ...] stack of FFDs vmaps/gathers cleanly.
    """

    def __init__(self, B: jnp.ndarray, P0: jnp.ndarray, num_grids: int,
                 constraints: Sequence[Constraint] = CAR_CONSTRAINTS):
        self.B = B          # [V, G, G, G] (or [M, V, G, G, G] when stacked)
        self.P0 = P0        # [3, G, G, G]
        self.num_grids = num_grids
        self.constraints = tuple(constraints)

    @classmethod
    def from_vertices(cls, vertices: np.ndarray, num_grids: int = 4,
                      constraints: Sequence[Constraint] = CAR_CONSTRAINTS) -> "FFD":
        B, P0 = make_ffd_basis(vertices, num_grids)
        return cls(jnp.asarray(B), jnp.asarray(P0), num_grids, constraints)

    def __call__(self, ffd_coeff: jnp.ndarray) -> jnp.ndarray:
        """ffd_coeff: [3 * G^3] -> deformed vertices [V, 3] (transforms.py:68-99)."""
        G = self.num_grids
        dP = ffd_coeff.reshape(3, G, G, G)
        dP = apply_constraints(dP, self.constraints)
        P = (self.P0 + dP).reshape(3, G ** 3)          # [3, G^3]
        B = self.B.reshape(self.B.shape[0], G ** 3)     # [V, G^3]
        # Full f32 precision: geometry must not go through bf16 MXU passes.
        return jnp.matmul(B, P.T, precision=jax.lax.Precision.HIGHEST)

    def tree_flatten(self):
        return (self.B, self.P0), (self.num_grids, self.constraints)

    @classmethod
    def tree_unflatten(cls, aux, children):
        B, P0 = children
        num_grids, constraints = aux
        return cls(B, P0, num_grids, constraints)


def deform(B: jnp.ndarray, P0: jnp.ndarray, ffd_coeff: jnp.ndarray,
           num_grids: int = 4,
           constraints: Sequence[Constraint] = CAR_CONSTRAINTS) -> jnp.ndarray:
    """Functional FFD: B [V,G,G,G], P0 [3,G,G,G], ffd_coeff [3*G^3] -> [V,3].

    vmap-friendly form used by the batched multi-object render path.
    """
    G = num_grids
    dP = apply_constraints(ffd_coeff.reshape(3, G, G, G), constraints)
    P = (P0 + dP).reshape(3, G ** 3)
    return jnp.matmul(B.reshape(B.shape[0], G ** 3), P.T,
                      precision=jax.lax.Precision.HIGHEST)
