"""Max-of-Gaussians (GMM) pose prior, precomputed and jittable.

Replaces tuch/smplify/prior.py:36-167. The precision matrices and NLL
weights are precomputed on the host at construction; the forward is a pure
einsum + min, identical math to the reference's merged_log_likelihood.
"""

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class GMMPrior(NamedTuple):
    means: jnp.ndarray        # (M, 69)
    precisions: jnp.ndarray   # (M, 69, 69)
    nll_weights: jnp.ndarray  # (1, M)


def create_gmm_prior(gmm: dict, epsilon: float = 1e-16) -> GMMPrior:
    """gmm: dict(means, covs, weights) as from assets.load_gmm_prior."""
    means = np.asarray(gmm['means'], np.float64)
    covs = np.asarray(gmm['covs'], np.float64)
    weights = np.asarray(gmm['weights'], np.float64)

    precisions = np.stack([np.linalg.inv(c) for c in covs])
    sqrdets = np.array([np.sqrt(np.linalg.det(c)) for c in covs])
    const = (2 * np.pi) ** (69 / 2.0)
    nll_weights = (weights / (const * (sqrdets / sqrdets.min())))[None]
    return GMMPrior(means=jnp.asarray(means, jnp.float32),
                    precisions=jnp.asarray(precisions, jnp.float32),
                    nll_weights=jnp.asarray(nll_weights, jnp.float32))


def gmm_prior_nll(prior: GMMPrior, body_pose: jnp.ndarray) -> jnp.ndarray:
    """Min-over-components negative log likelihood, (B, 69) -> (B,).

    Matches tuch/smplify/prior.py:117-132 (merged_log_likelihood; betas are
    unused there too).
    """
    diff = body_pose[:, None, :] - prior.means[None]         # (B, M, 69)
    pd = jnp.einsum('mij,bmj->bmi', prior.precisions, diff)
    quad = jnp.sum(pd * diff, axis=-1)                        # (B, M)
    ll = 0.5 * quad - jnp.log(prior.nll_weights)
    return jnp.min(ll, axis=1)
