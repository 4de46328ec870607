"""Observability: scalars / histograms / images to TensorBoard event files
plus the composite matplotlib plots of the reference.

Capability parity with ``/root/reference/gan/utils/summary_helper.py:21-588``
(three writer modes: train -> ``output_dir``, validation ->
``output_dir/validation``, spike-metrics -> ``output_dir/metrics`` with a
vector-plot dir), re-designed on a dependency-free event writer
(:mod:`calciumgan_tpu.utils.tb`) and plain matplotlib (the reference's
seaborn ``distplot``/positional-``JointGrid`` calls are long deprecated).
Figures are additionally saved as PNGs under ``<logdir>/plots`` so runs are
inspectable without TensorBoard.
"""

from __future__ import annotations

import functools
import io
import os
import shutil
import threading
from typing import Optional

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

from calciumgan_tpu.utils.tb import EventWriter  # noqa: E402

# pyplot's implicit current-figure state is process-global; concurrent
# sweep experiments (search.py --parallel) must serialise their plotting
_PLT_LOCK = threading.RLock()


def _locked(fn):
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with _PLT_LOCK:
            return fn(*args, **kwargs)
    return wrapper

REAL_COLOR = "dodgerblue"
FAKE_COLOR = "orangered"
FRAMERATE = 24  # Hz, reference summary_helper.py:66


class Summary:

    def __init__(self, config, spike_metrics: bool = False):
        self._config = config
        self.spike_metrics = spike_metrics
        self.dpi = getattr(config, "dpi", 120)
        self.framerate = FRAMERATE
        self.real_color = REAL_COLOR
        self.fake_color = FAKE_COLOR
        self._plot_weights = getattr(config, "plot_weights", False)

        # multi-host: TensorBoard chief-only writes — non-zero processes
        # would race on event filenames (same host + second) and duplicate
        # every figure; they keep a fully inert Summary
        import jax
        self._noop = jax.process_index() != 0

        if spike_metrics:
            self._metrics_dir = os.path.join(config.output_dir, "metrics")
            self.format = getattr(config, "format", "pdf")
            self._vector_dir = os.path.join(self._metrics_dir, "plots")
            if not self._noop:
                self.metrics_writer = EventWriter(self._metrics_dir)
                if os.path.exists(self._vector_dir):
                    shutil.rmtree(self._vector_dir)
                os.makedirs(self._vector_dir)
        else:
            self.profiler_dir = os.path.join(config.output_dir, "profiler")
            if not self._noop:
                self.train_writer = EventWriter(config.output_dir)
                self.val_writer = EventWriter(
                    os.path.join(config.output_dir, "validation"))

        for k, v in (("xtick", 12), ("ytick", 12), ("legend", 12)):
            plt.rc(k, **{"labelsize" if k != "legend" else "fontsize": v})
        plt.rc("axes", titlesize=14, labelsize=14)

    # ------------------------------------------------------------------
    def _writer(self, training: bool) -> EventWriter:
        if self.spike_metrics:
            return self.metrics_writer
        return self.train_writer if training else self.val_writer

    def scalar(self, tag, value, step=0, training=True):
        if self._noop:
            return
        self._writer(training).scalar(tag, float(np.asarray(value)), step)

    def histogram(self, tag, values, step=0, training=True):
        if self._noop:
            return
        self._writer(training).histogram(tag, np.asarray(values), step)

    def flush(self):
        if self._noop:
            return
        if self.spike_metrics:
            self.metrics_writer.flush()
        else:
            self.train_writer.flush()
            self.val_writer.flush()

    # ------------------------------------------------------------------
    def _emit_figure(self, tag, step, training):
        """Finalise plt's current figure: PNG -> event file + plots dir,
        optional vector copy for the metrics mode."""
        if self._noop:
            plt.close(plt.gcf())
            return
        import warnings as _warnings
        with _warnings.catch_warnings():
            # gridspec figures (raster plot) are not tight_layout-compatible
            _warnings.simplefilter("ignore", UserWarning)
            plt.tight_layout()
        fig = plt.gcf()
        buf = io.BytesIO()
        fig.savefig(buf, dpi=90, format="png", facecolor="white")
        png = buf.getvalue()
        w, h = fig.canvas.get_width_height()
        writer = self._writer(training)
        writer.image(f"{tag}/image/0", png, height=h, width=w, step=step)

        logdir = (self._metrics_dir if self.spike_metrics else
                  (self._config.output_dir if training else
                   os.path.join(self._config.output_dir, "validation")))
        plots_dir = os.path.join(logdir, "plots")
        os.makedirs(plots_dir, exist_ok=True)
        safe = tag.replace("/", "_")
        fig.savefig(os.path.join(plots_dir, f"{safe}_step{step:06d}.png"),
                    dpi=self.dpi, format="png", facecolor="white")
        if self.spike_metrics:
            fig.savefig(os.path.join(self._vector_dir, f"{safe}.{self.format}"),
                        dpi=self.dpi, format=self.format)
        plt.close(fig)

    @staticmethod
    def _despine(ax):
        ax.spines["top"].set_visible(False)
        ax.spines["right"].set_visible(False)

    # ------------------------------------------------------------------
    @_locked
    def plot_traces(self, tag, signals, spikes, indexes, ylims=None,
                    xlabel="Time (s)", ylabel=r"$\Delta F/F$", step=0,
                    training=True, is_real=True, signal_label="signal",
                    spike_label="spike", plots_per_row=3):
        """Signal traces + spike rasters per neuron
        (parity: ``summary_helper.py:121-206``)."""
        signals, spikes = np.asarray(signals), np.asarray(spikes)
        assert signals.ndim == 2 and spikes.ndim == 2
        num_rows = -(-len(indexes) // plots_per_row)
        fig = plt.figure(figsize=(5 * plots_per_row, 2.5 * num_rows))
        fig.patch.set_facecolor("white")
        color = self.real_color if is_real else self.fake_color

        for i, neuron in enumerate(indexes):
            ax = plt.subplot(num_rows, plots_per_row, i + 1)
            ax.plot(signals[neuron], label=signal_label, linewidth=1,
                    alpha=0.6, color=color)
            ticks = np.arange(0, signals.shape[1], 200)
            ax.set_xticks(ticks)
            ax.set_xticklabels(ticks // self.framerate)
            x = np.nonzero(spikes[neuron])[0]
            fill = (ylims[neuron][0] +
                    (ylims[neuron][1] - ylims[neuron][0]) * 0.1
                    if ylims else 0)
            ax.scatter(x, np.full(x.shape, fill), s=100, marker="|",
                       linewidth=1.5, label=spike_label, color="dimgray")
            if i == 0:
                ax.legend(loc="upper right", ncol=1, frameon=False)
            ax.set_title(f"Neuron #{neuron:03d}")
            if i == len(indexes) - 1:
                ax.set_xlabel(xlabel)
            ax.set_ylabel(ylabel)
            if ylims:
                ax.set_ylim(ylims[neuron])
            self._despine(ax)
        self._emit_figure(tag, step, training)

    @_locked
    def raster_plot(self, tag, real_spikes, fake_spikes, xlabel="",
                    ylabel="", legend_labels=None, step=0, training=True):
        """Joint raster (trial x time scatter) with marginal histograms
        (parity: ``summary_helper.py:208-315``), via a matplotlib gridspec
        instead of the deprecated seaborn JointGrid API."""
        real_x, real_y = np.nonzero(np.asarray(real_spikes))
        fake_x, fake_y = np.nonzero(np.asarray(fake_spikes))

        fig = plt.figure(figsize=(9, 7))
        fig.patch.set_facecolor("white")
        gs = fig.add_gridspec(2, 2, width_ratios=(8, 1), height_ratios=(1, 8),
                              hspace=0.05, wspace=0.05)
        ax = fig.add_subplot(gs[1, 0])
        ax_mx = fig.add_subplot(gs[0, 0], sharex=ax)
        ax_my = fig.add_subplot(gs[1, 1], sharey=ax)

        ax.scatter(real_y, real_x, color=self.real_color, marker="|",
                   linewidth=1.5, alpha=0.7, s=40)
        ax.scatter(fake_y, fake_x, color=self.fake_color, marker="|",
                   linewidth=1.5, alpha=0.7, s=40)
        ax.set_xlabel(xlabel)
        ax.set_ylabel(ylabel)
        ax.set_ylim([-2, 104])
        ticks = np.asarray(ax.get_xticks())
        ax.set_xticks(ticks)  # fix the locator before relabelling
        ax.set_xticklabels((ticks // self.framerate).astype(np.int64))

        def marg(axm, real, fake, vertical):
            if real.size + fake.size == 0:
                return
            kw = dict(bins=25, alpha=0.6, rwidth=0.85,
                      orientation="horizontal" if vertical else "vertical")
            axm.hist(real, color=self.real_color, **kw)
            axm.hist(fake, color=self.fake_color, **kw)
            axm.axis("off")

        marg(ax_mx, real_y, fake_y, vertical=False)
        marg(ax_my, real_x, fake_x, vertical=True)

        if legend_labels is not None:
            ax.legend(labels=legend_labels, ncol=2, frameon=True,
                      loc=(0.02, 0.95), fancybox=True, framealpha=1)
        self._emit_figure(tag, step, training)

    @_locked
    def plot_distribution(self, tag, data, xlabel="", ylabel="", title="",
                          bins=30, step=0, training=False):
        fig = plt.figure(figsize=(5, 4))
        fig.patch.set_facecolor("white")
        ax = plt.gca()
        values = np.asarray(data).ravel()
        values = values[np.isfinite(values)]
        if values.size:
            ax.hist(values, bins=bins, rwidth=0.85, color="green")
        ax.set_xlabel(xlabel)
        ax.set_ylabel(ylabel)
        if title:
            ax.set_title(title)
        self._despine(ax)
        self._emit_figure(tag, step, training)

    @_locked
    def plot_histogram(self, tag, data, xlabel="", ylabel="", step=0,
                       training=False, legend_labels=None):
        """Real-vs-fake overlaid histogram. Fixes the reference's range bug
        (it used data[0] for both ends — ``summary_helper.py:360-366``,
        SURVEY.md §2.11.4)."""
        assert isinstance(data, tuple)
        fig = plt.figure(figsize=(12, 10))
        fig.patch.set_facecolor("white")
        ax = plt.gca()
        lo = min(np.min(data[0]), np.min(data[1]))
        hi = max(np.max(data[0]), np.max(data[1]))
        kw = dict(bins=30, range=(lo, hi), rwidth=0.85, alpha=0.6)
        ax.hist(data[0], color=self.real_color, label="Real", **kw)
        ax.hist(data[1], color=self.fake_color, label="Fake", **kw)
        if legend_labels is not None:
            ax.legend(labels=legend_labels)
        ax.set_xlabel(xlabel)
        ax.set_ylabel(ylabel)
        self._despine(ax)
        self._emit_figure(tag, step, training)

    @_locked
    def plot_histograms_grid(self, tag, data, xlabel="", ylabel="",
                             titles=None, step=0, training=False,
                             legend_labels=None, plots_per_row=3):
        assert isinstance(data, list) and isinstance(data[0], tuple)
        num_rows = -(-len(data) // plots_per_row)
        fig = plt.figure(figsize=(5 * plots_per_row, 5 * num_rows))
        fig.patch.set_facecolor("white")
        for i, (real, fake) in enumerate(data):
            ax = plt.subplot(num_rows, plots_per_row, i + 1)
            real, fake = np.asarray(real), np.asarray(fake)
            if real.size and fake.size:
                lo = min(np.min(real), np.min(fake))
                hi = max(np.max(real), np.max(fake))
                kw = dict(bins=30, range=(lo, hi), rwidth=0.85, alpha=0.6)
                ax.hist(real, color=self.real_color, label="Real", **kw)
                ax.hist(fake, color=self.fake_color, label="Fake", **kw)
            if i == 0 and legend_labels is not None:
                ax.legend(labels=legend_labels, frameon=False)
            ax.set_ylabel(ylabel)
            if titles is not None:
                ax.set_title(titles[i])
            if i // plots_per_row == num_rows - 1:
                ax.set_xlabel(xlabel)
            self._despine(ax)
        self._emit_figure(tag, step, training)

    @_locked
    def plot_heatmaps_grid(self, tag, matrix, xlabel="", ylabel="",
                           xticklabels=None, yticklabels=None, titles=None,
                           step=0, training=False, plots_per_row=3):
        assert isinstance(matrix, list)
        num_rows = -(-len(matrix) // plots_per_row)
        fig = plt.figure(figsize=(5 * plots_per_row, 5 * num_rows))
        fig.patch.set_facecolor("white")
        vmax = float(np.max([np.max(m) for m in matrix]))
        for i, m in enumerate(matrix):
            ax = plt.subplot(num_rows, plots_per_row, i + 1)
            im = ax.imshow(m, cmap="YlOrRd", vmin=0, vmax=vmax,
                           aspect="auto")
            fig.colorbar(im, ax=ax)
            ax.set_xlabel(xlabel)
            ax.set_ylabel(ylabel)
            if titles is not None:
                ax.set_title(titles[i])
            if isinstance(xticklabels, list):
                ticks = list(range(0, len(xticklabels[i]), 2))
                ax.set_xticks(ticks)
                ax.set_xticklabels([xticklabels[i][t] for t in ticks],
                                   fontsize=12)
            if isinstance(yticklabels, list):
                ticks = list(range(0, len(yticklabels[i]), 2))
                ax.set_yticks(ticks)
                ax.set_yticklabels([yticklabels[i][t] for t in ticks],
                                   fontsize=12)
        self._emit_figure(tag, step, training)

    # ------------------------------------------------------------------
    def variable_summary(self, variable, name, step=0, training=True):
        v = np.asarray(variable)
        self.scalar(f"{name}/0_mean", v.mean(), step, training)
        self.scalar(f"{name}/1_stddev", v.std(), step, training)
        self.scalar(f"{name}/2_min", v.min(), step, training)
        self.scalar(f"{name}/3_max", v.max(), step, training)
        self.histogram(name, v, step, training)

    def plot_weights(self, state, step=0, training=True):
        """Per-parameter stats for both nets (``summary_helper.py:542-557``);
        operates on the train-state pytree rather than Keras variables."""
        import jax
        for prefix, params in (("plots_generator", state.generator.params),
                               ("plots_discriminator",
                                state.discriminator.params)):
            flat = jax.tree_util.tree_flatten_with_path(params)[0]
            for i, (path, leaf) in enumerate(flat):
                name = "/".join(
                    str(getattr(p, "key", p)) for p in path)
                self.variable_summary(
                    jax.device_get(leaf), f"{prefix}/{i + 1:02d}/{name}",
                    step=step, training=training)

    def log(self, logs: dict, elapse: Optional[float] = None, state=None,
            step: int = 0, training: bool = True):
        """Consolidated per-epoch-half scalar dump
        (``summary_helper.py:559-588``)."""
        for tag, value in logs.items():
            self.scalar(tag, value, step=step, training=training)
        if elapse is not None:
            self.scalar("elapse", elapse, step=step, training=training)
        if state is not None and self._plot_weights:
            self.plot_weights(state, step=step, training=training)
        self.flush()
