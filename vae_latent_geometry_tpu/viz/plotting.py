"""Visualization layer (matplotlib/seaborn), device-accelerated where hot.

Reference plots (``src/plotting.py``, ``src/plot_latents.py``):
- latent density + splines (Gaussian-KDE background, log1p(1/(density+eps))
  metric proxy, dashed init vs solid optimized overlays) — the reference
  computes the KDE with a Python loop over all 23,822 latents per grid
  (``src/plotting.py:58-62``); here it is one jitted chunked reduction.
- metric ellipses (eigendecomposition of the pullback metric along a path).
- latents + selected representatives;  initialized-spline plot;
  init+optimized overlay (first 10 splines).
- ensemble-uncertainty latent map (``src/plot_latents.py``).
- loss curves, CoV-vs-decoders curves, distance-matrix heatmaps.

Everything takes numpy arrays / artifacts, writes a PNG, and never raises
into the pipeline (callers wrap in try/except).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
from matplotlib import cm, patches  # noqa: E402
from mpl_toolkits.axes_grid1 import make_axes_locatable  # noqa: E402


def _ensure_dir(path: str) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)


def _get_cmap(name: str, n: int):
    """Resampled named colormap; `cm.get_cmap` is removed in matplotlib
    3.11, `matplotlib.colormaps` appeared in 3.6."""
    try:
        return matplotlib.colormaps[name].resampled(n)
    except AttributeError:  # pragma: no cover - matplotlib < 3.6
        return cm.get_cmap(name, n)


def _square_limits(latents: np.ndarray, margin_frac: float = 0.1):
    x, y = latents[:, 0], latents[:, 1]
    span = max(x.max() - x.min(), y.max() - y.min())
    cx, cy = (x.max() + x.min()) / 2, (y.max() + y.min()) / 2
    half = span / 2 + margin_frac * span
    return (cx - half, cx + half), (cy - half, cy + half)


def kde_density(latents: np.ndarray, grid: np.ndarray, sigma: float = 0.3,
                chunk: int = 4096) -> np.ndarray:
    """Gaussian KDE of latents evaluated on grid — one jitted chunked
    reduction on device instead of a 23k-iteration host loop."""
    import jax
    import jax.numpy as jnp

    lat = jnp.asarray(latents)

    @jax.jit
    def dens(g):
        d2 = jnp.sum((g[:, None, :] - lat[None, :, :]) ** 2, axis=-1)
        return jnp.sum(jnp.exp(-0.5 * d2 / sigma**2), axis=1)

    parts = [np.asarray(dens(jnp.asarray(grid[i:i + chunk])))
             for i in range(0, len(grid), chunk)]
    out = np.concatenate(parts)
    return out / (len(latents) * 2 * np.pi * sigma**2)


def _spline_points(omega, a, b, basis, n_poly: int, n: int = 300) -> np.ndarray:
    import jax.numpy as jnp

    from vae_latent_geometry_tpu.geometry.spline import (
        design_matrix,
        eval_spline_design,
    )

    t = jnp.linspace(0.0, 1.0, n)
    phi = design_matrix(t, jnp.asarray(basis), n_poly)
    g = eval_spline_design(jnp.asarray(omega)[None], jnp.asarray(a)[None],
                           jnp.asarray(b)[None], phi, t)
    return np.asarray(g[:, 0, :])


def plot_latent_density_with_splines(latents, labels, art, save_path: str,
                                     res: int = 300, seed=None,
                                     sigma: float = 0.3, eps: float = 1e-4,
                                     max_splines: int = 10) -> None:
    """Density background + init (dashed) / optimized (solid) overlays."""
    _ensure_dir(save_path)
    xlim, ylim = _square_limits(latents)
    xi, yi = np.mgrid[xlim[0]:xlim[1]:res * 1j, ylim[0]:ylim[1]:res * 1j]
    grid = np.stack([xi.ravel(), yi.ravel()], axis=-1).astype(np.float32)
    density = kde_density(latents, grid, sigma)
    log_metric = np.log1p(1.0 / (density + eps)).reshape(xi.shape)

    fig, ax = plt.subplots(figsize=(8, 8))
    im = ax.imshow(log_metric.T, origin="lower", extent=(*xlim, *ylim),
                   cmap="copper", alpha=0.8)
    try:
        import seaborn as sns

        sns.scatterplot(x=latents[:, 0], y=latents[:, 1], hue=labels,
                        palette="tab20", s=4, alpha=0.4, legend=False, ax=ax)
    except Exception:
        ax.scatter(latents[:, 0], latents[:, 1], s=2, alpha=0.4)

    colors = _get_cmap("tab10", max(min(len(art.a), max_splines), 1))
    for i in range(min(len(art.a), max_splines)):
        if not art.valid[i]:
            continue
        color = colors(i)
        z_init = _spline_points(art.omega_init[i], art.a[i], art.b[i],
                                art.basis, art.n_poly)
        ax.plot(z_init[:, 0], z_init[:, 1], "--", lw=1.2, alpha=0.6, c=color)
        if art.omega_optimized is not None:
            z_opt = _spline_points(art.omega_optimized[i], art.a[i], art.b[i],
                                   art.basis, art.n_poly)
            ax.plot(z_opt[:, 0], z_opt[:, 1], "-", lw=2.0, c=color)

    ax.set_xlim(xlim); ax.set_ylim(ylim)
    ax.set_aspect("equal", adjustable="box")
    ax.set_xlabel("z1"); ax.set_ylabel("z2")
    ax.set_title(f"Geodesics in latent space (seed {seed})")
    divider = make_axes_locatable(ax)
    cax = divider.append_axes("right", size="5%", pad=0.1)
    fig.colorbar(im, cax=cax, label="log(1 + 1/(density+eps))")
    plt.savefig(save_path, dpi=300, bbox_inches="tight")
    plt.close(fig)


def plot_metric_ellipses(ax, z_path: np.ndarray, metrics: np.ndarray,
                         every: int = 20, scale: float = 0.2) -> None:
    """Ellipse patches of the 2x2 pullback metric along a path."""
    for z, G in zip(z_path[::every], metrics[::every]):
        eigvals, eigvecs = np.linalg.eigh(G)
        width, height = scale * np.sqrt(np.maximum(eigvals, 0))
        angle = np.degrees(np.arctan2(eigvecs[1, 0], eigvecs[0, 0]))
        ax.add_patch(patches.Ellipse(xy=z, width=width, height=height,
                                     angle=angle, edgecolor="black",
                                     facecolor="none", lw=1))


def pullback_metrics(decoder_params, z_path: np.ndarray) -> np.ndarray:
    """G(z) = J(z)^T J(z) along a path via one vmapped jacfwd (the done-right
    version of the reference's row-by-row autograd loop,
    ``src/old_/jacobian_smgs.py:4-8``)."""
    import jax
    import jax.numpy as jnp

    from vae_latent_geometry_tpu.models import nets

    jac = jax.vmap(jax.jacfwd(lambda z: nets.decoder_apply(decoder_params, z)))
    J = jac(jnp.asarray(z_path))                  # (P, X, D)
    return np.asarray(jnp.einsum("pxi,pxj->pij", J, J))


def plot_latents_with_selected(latents, representatives, save_path: str) -> None:
    _ensure_dir(save_path)
    fig, ax = plt.subplots(figsize=(7, 7))
    ax.scatter(latents[:, 0], latents[:, 1], s=5, alpha=0.4, label="All data")
    sel = latents[[r["index"] for r in representatives]]
    ax.scatter(sel[:, 0], sel[:, 1], c="red", s=30, label="Selected",
               edgecolors="black")
    for i, (x, y) in enumerate(sel):
        ax.annotate(str(i), (x, y), fontsize=8, xytext=(3, 3),
                    textcoords="offset points")
    ax.set_aspect("equal"); ax.legend()
    ax.set_title("Latent space with selected representatives")
    plt.tight_layout(); plt.savefig(save_path, dpi=300); plt.close(fig)


def plot_initialized_splines(latents, art, save_path: str) -> None:
    _ensure_dir(save_path)
    fig, ax = plt.subplots(figsize=(8, 8))
    ax.scatter(latents[:, 0], latents[:, 1], s=2, color="lightgray", alpha=0.5)
    colors = cm.tab20(np.linspace(0, 1, max(len(art.a), 1)))
    for i in range(len(art.a)):
        if not art.valid[i]:
            continue
        z = _spline_points(art.omega_init[i], art.a[i], art.b[i], art.basis,
                           art.n_poly)
        ax.plot(z[:, 0], z[:, 1], "-", color=colors[i % len(colors)], lw=1.5)
    if art.representatives:
        rep_z = latents[[r["index"] for r in art.representatives]]
        ax.scatter(rep_z[:, 0], rep_z[:, 1], s=20, color="black", zorder=3)
    ax.set_title("Initialized geodesic splines")
    ax.axis("equal"); ax.grid(True)
    plt.tight_layout(); plt.savefig(save_path, dpi=300); plt.close(fig)


def plot_initial_and_optimized_splines(latents, art, save_path: str,
                                       max_splines: int = 10) -> None:
    _ensure_dir(save_path)
    fig, ax = plt.subplots(figsize=(8, 8))
    ax.scatter(latents[:, 0], latents[:, 1], s=2, color="lightgray", alpha=0.5)
    n = min(len(art.a), max_splines)
    colors = cm.tab10(np.linspace(0, 1, max(n, 1)))
    for i in range(n):
        if not art.valid[i]:
            continue
        color = colors[i % len(colors)]
        z_i = _spline_points(art.omega_init[i], art.a[i], art.b[i], art.basis,
                             art.n_poly)
        ax.plot(z_i[:, 0], z_i[:, 1], "--", lw=1.0, color=color, alpha=0.6)
        if art.omega_optimized is not None:
            z_o = _spline_points(art.omega_optimized[i], art.a[i], art.b[i],
                                 art.basis, art.n_poly)
            ax.plot(z_o[:, 0], z_o[:, 1], "-", lw=2.0, color=color)
    ax.set_aspect("equal")
    ax.set_title("Initial (dashed) and optimized (solid) geodesic splines")
    plt.tight_layout(); plt.savefig(save_path, dpi=300); plt.close(fig)


def plot_uncertainty_map(params, latents, save_path: str,
                         colors: Optional[np.ndarray] = None,
                         resolution: int = 100, padding: float = 0.5) -> None:
    """Ensemble-disagreement heatmap over latent space + latent scatter
    (reference ``src/plot_latents.py:52-110``)."""
    import jax.numpy as jnp

    from vae_latent_geometry_tpu.models.evae import decoder_std

    _ensure_dir(save_path)
    c1 = (latents[:, 0].min() + latents[:, 0].max()) / 2
    c2 = (latents[:, 1].min() + latents[:, 1].max()) / 2
    half = max(np.ptp(latents[:, 0]), np.ptp(latents[:, 1])) / 2 + padding
    zs1 = np.linspace(c1 - half, c1 + half, resolution)
    zs2 = np.linspace(c2 - half, c2 + half, resolution)
    Z1, Z2 = np.meshgrid(zs1, zs2, indexing="xy")
    grid = np.stack([Z1.ravel(), Z2.ravel()], axis=-1).astype(np.float32)
    std = np.asarray(decoder_std(params.decoders, jnp.asarray(grid)))
    unc = std.mean(axis=1).reshape(resolution, resolution)

    fig, ax = plt.subplots(figsize=(7, 7))
    divider = make_axes_locatable(ax)
    cax = divider.append_axes("right", size="5%", pad=0.05)
    pc = ax.pcolormesh(Z1, Z2, unc, cmap="viridis", shading="auto",
                       rasterized=True)
    plt.colorbar(pc, cax=cax, label="Decoder uncertainty (std)")
    ax.scatter(latents[:, 0], latents[:, 1],
               c=colors if colors is not None else "k", s=5, alpha=0.8,
               linewidth=0)
    ax.set_aspect("equal", adjustable="box")
    ax.set_xlabel("z1"); ax.set_ylabel("z2")
    ax.set_title("Latent space ensemble uncertainty")
    plt.tight_layout(); plt.savefig(save_path, dpi=300); plt.close(fig)


def plot_loss_curves(train_losses, val_losses, save_path: str) -> None:
    _ensure_dir(save_path)
    fig = plt.figure(figsize=(8, 5))
    plt.plot(train_losses, label="Train")
    plt.plot(val_losses, label="Val")
    plt.xlabel("Epoch"); plt.ylabel("Neg ELBO"); plt.title("Training curve")
    plt.legend(); plt.grid(True); plt.tight_layout()
    plt.savefig(save_path); plt.close(fig)


def plot_cov_curves(cov_result, save_path: str) -> None:
    _ensure_dir(save_path)
    ks = cov_result.decoder_counts
    y_geo = [cov_result.avg_cov_geodesic[k] for k in ks]
    fig = plt.figure(figsize=(8, 5))
    plt.plot(ks, y_geo, marker="o", label="Geodesic CoV")
    plt.plot(ks, [cov_result.avg_cov_euclidean] * len(ks), "--",
             label="Euclidean CoV")
    plt.xlabel("Number of decoders"); plt.xticks(ks)
    plt.ylabel("Average coefficient of variation")
    plt.title("CoV vs number of decoders")
    plt.legend(); plt.grid(True); plt.tight_layout()
    plt.savefig(save_path); plt.close(fig)


def plot_cov_hist(cov_values, save_path: str,
                  title: str = "Coefficient of Variation (CoV) Across Seeds",
                  bins: int = 30) -> None:
    """Per-pair CoV histogram with a KDE overlay (reference artifact
    ``experiment/plots/cov_hist_euclidean_10.png`` — its producer code is
    not committed upstream; this reconstructs the plot from the same
    per-pair CoV values the cov analysis emits)."""
    _ensure_dir(save_path)
    vals = np.asarray(cov_values, float)
    vals = vals[np.isfinite(vals)]
    fig, ax = plt.subplots(figsize=(8, 5))
    counts, edges, _ = ax.hist(vals, bins=bins, color="#9f95d8",
                               edgecolor="black", alpha=0.85)
    if len(vals) > 1 and np.std(vals) > 0:
        from scipy.stats import gaussian_kde

        xs = np.linspace(vals.min(), vals.max(), 200)
        kde = gaussian_kde(vals)(xs)
        # scale the density to histogram-count units
        ax.plot(xs, kde * len(vals) * (edges[1] - edges[0]),
                color="#7b68ce", lw=2.5)
    ax.set_xlabel("CoV"); ax.set_ylabel("Frequency")
    ax.set_title(title)
    plt.tight_layout(); plt.savefig(save_path, dpi=300); plt.close(fig)


def plot_density_illustration(latents, art, save_path: str,
                              point_colors: Optional[np.ndarray] = None,
                              labels: Optional[Sequence] = None,
                              res: int = 300, seed=None, sigma: float = 0.3,
                              eps: float = 1e-4,
                              max_splines: int = 10) -> None:
    """'Geodesics in Latent Space' illustration (reference
    ``src/plots/density_illustration_examples{seed}.png``): copper
    density-metric background, latents colored per class (hex colors when
    given), init (dashed) / optimized (solid) geodesic overlays, colorbar
    labeled with the density-based metric."""
    _ensure_dir(save_path)
    xlim, ylim = _square_limits(latents)
    xi, yi = np.mgrid[xlim[0]:xlim[1]:res * 1j, ylim[0]:ylim[1]:res * 1j]
    grid = np.stack([xi.ravel(), yi.ravel()], axis=-1).astype(np.float32)
    density = kde_density(latents, grid, sigma)
    log_metric = np.log1p(1.0 / (density + eps)).reshape(xi.shape)

    fig, ax = plt.subplots(figsize=(10, 9))
    im = ax.imshow(log_metric.T, origin="lower", extent=(*xlim, *ylim),
                   cmap="copper", alpha=0.9)
    if point_colors is not None:
        ax.scatter(latents[:, 0], latents[:, 1], c=point_colors, s=4,
                   alpha=0.5, linewidth=0.1, edgecolors="white")
    elif labels is not None:
        _, inv = np.unique(np.asarray(labels), return_inverse=True)
        ax.scatter(latents[:, 0], latents[:, 1], c=inv, cmap="tab20", s=4,
                   alpha=0.5, linewidth=0)
    else:
        ax.scatter(latents[:, 0], latents[:, 1], s=3, alpha=0.4, c="gray")

    colors = _get_cmap("tab10", max(min(len(art.a), max_splines), 1))
    for i in range(min(len(art.a), max_splines)):
        if not art.valid[i]:
            continue
        color = colors(i)
        z_init = _spline_points(art.omega_init[i], art.a[i], art.b[i],
                                art.basis, art.n_poly)
        ax.plot(z_init[:, 0], z_init[:, 1], "--", lw=2.0, alpha=0.8, c=color)
        if art.omega_optimized is not None:
            z_opt = _spline_points(art.omega_optimized[i], art.a[i],
                                   art.b[i], art.basis, art.n_poly)
            ax.plot(z_opt[:, 0], z_opt[:, 1], "-", lw=3.0, c=color)
    ax.set_xlim(xlim); ax.set_ylim(ylim)
    ax.set_aspect("equal", adjustable="box")
    ax.set_xlabel("z$_1$"); ax.set_ylabel("z$_2$")
    title = ("Geodesics in Latent Space" if seed is None
             else f"Geodesics in Latent Space (seed {seed})")
    ax.set_title(title)
    divider = make_axes_locatable(ax)
    cax = divider.append_axes("right", size="4%", pad=0.1)
    fig.colorbar(im, cax=cax,
                 label="Density-based metric value log(G$_x$)")
    plt.savefig(save_path, dpi=300, bbox_inches="tight")
    plt.close(fig)


def plot_distance_matrix(mat: np.ndarray, labels: Sequence[str],
                         save_path: str, title: str = "") -> None:
    _ensure_dir(save_path)
    fig = plt.figure(figsize=(10, 10))
    try:
        import seaborn as sns

        sns.heatmap(mat, square=True, xticklabels=labels, yticklabels=labels,
                    cmap="copper", cbar=False)
    except Exception:
        plt.imshow(mat, cmap="copper")
    plt.xticks(rotation=90, fontsize=4); plt.yticks(rotation=0, fontsize=4)
    plt.title(title); plt.xlabel("Cluster"); plt.ylabel("Cluster")
    plt.tight_layout(); plt.savefig(save_path, dpi=300); plt.close(fig)
