"""Host-side visualization (L6): IWE images, HSV flow colorization,
overlays, loss-history plots.

Behavioral parity with reference ``src/visualizer.py``: same API surface,
auto-numbered per-prefix filenames, DSEC-style ``ord=0.5`` magnitude
colorization, flow-on-event-mask and overlay composites.  Pure host code
(PIL/matplotlib/numpy); the only device work is the IWE used for event
images, reusing the jax rasterizer.
"""

import logging
import os
from typing import Any, Dict, Optional

import numpy as np

logger = logging.getLogger(__name__)

from PIL import Image

from .ops.iwe import EventImageConverter

TRANSPARENCY = 0.25
OPACITY = int(255 * TRANSPARENCY)


def _hsv_to_rgb_uint8(hsv: np.ndarray) -> np.ndarray:
    """HSV (uint8, hue 0-179 as in OpenCV) -> RGB uint8."""
    try:
        import cv2

        return cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)
    except ImportError:
        from matplotlib.colors import hsv_to_rgb

        h = hsv[..., 0].astype(np.float64) / 180.0
        s = hsv[..., 1].astype(np.float64) / 255.0
        v = hsv[..., 2].astype(np.float64) / 255.0
        rgb = hsv_to_rgb(np.stack([h, s, v], axis=-1))
        return (rgb * 255).astype(np.uint8)


class Visualizer:
    """Args:
        image_shape (tuple) ... [H, W]
        show (bool) / save (bool) / save_dir (str)
    """

    def __init__(self, image_shape: tuple, show=False, save=False, save_dir=None,
                 async_save: bool = True) -> None:
        self.update_image_shape(image_shape)
        self._show = show
        self._save = save
        self.update_save_dir(save_dir or "./")
        self.default_prefix = ""
        self.default_save_count = 0
        self.prefixed_save_count: Dict[str, int] = {}
        # PNG encode+write off the critical path: filenames are still
        # allocated synchronously (deterministic numbering), only the
        # encode/IO runs on the pool.  flush() joins pending writes.
        self._async_save = async_save
        self._save_pool = None
        self._pending_saves: list = []

    def _submit_save(self, image: Image.Image, name: str) -> None:
        if not self._async_save:
            image.save(name)
            return
        if self._save_pool is None:
            from concurrent.futures import ThreadPoolExecutor

            self._save_pool = ThreadPoolExecutor(max_workers=2)
        self._pending_saves.append(self._save_pool.submit(image.save, name))

    def flush(self) -> None:
        """Wait for queued image writes; re-raise the first failure."""
        pending, self._pending_saves = self._pending_saves, []
        for fut in pending:
            fut.result()

    def update_image_shape(self, image_shape):
        self._image_size = tuple(image_shape)
        self._image_height, self._image_width = self._image_size
        self.imager = EventImageConverter(self._image_size)

    def update_save_dir(self, new_dir: str) -> None:
        self.save_dir = new_dir
        os.makedirs(self.save_dir, exist_ok=True)

    # --- filename bookkeeping (ref visualizer.py:67-117) -------------------
    def get_filename_from_prefix(self, prefix: Optional[str] = None, file_format: str = "png") -> str:
        if not prefix:
            name = os.path.join(self.save_dir, f"{self.default_prefix}{self.default_save_count}.{file_format}")
            self.default_save_count += 1
        else:
            self.prefixed_save_count[prefix] = self.prefixed_save_count.get(prefix, -1) + 1
            name = os.path.join(self.save_dir, f"{prefix}{self.prefixed_save_count[prefix]}.{file_format}")
        return name

    def rollback_save_count(self, prefix: Optional[str] = None):
        if not prefix:
            self.default_save_count -= 1
        else:
            self.prefixed_save_count[prefix] -= 1

    def reset_save_count(self, file_prefix: Optional[str] = None):
        if not file_prefix:
            self.default_save_count = 0
        elif file_prefix == "all":
            self.default_save_count = 0
            self.prefixed_save_count = {}
        else:
            del self.prefixed_save_count[file_prefix]

    def _show_or_save_image(self, image, file_prefix=None, fixed_file_name=None):
        if image.mode == "RGBA":
            image = image.convert("RGB")
        if self._show:
            image.show()
        if self._save:
            if fixed_file_name is not None:
                self._submit_save(image, os.path.join(self.save_dir, f"{fixed_file_name}.png"))
            else:
                self._submit_save(image, self.get_filename_from_prefix(file_prefix))

    # --- images -------------------------------------------------------------
    def load_image(self, image: Any) -> Image.Image:
        if isinstance(image, str):
            return Image.open(image)
        if isinstance(image, np.ndarray):
            return Image.fromarray(image)
        return image

    def visualize_image(self, image: Any, file_prefix: Optional[str] = None) -> Image.Image:
        image = self.load_image(image)
        self._show_or_save_image(image, file_prefix)
        return image

    def create_clipped_iwe_for_visualization(self, events, max_scale=50):
        import jax.numpy as jnp

        im = np.asarray(self.imager.create_iwe(jnp.asarray(np.asarray(events)), sigma=0))
        return 255 - np.clip(max_scale * im, 0, 255).astype(np.uint8)

    # --- optical flow (ref visualizer.py:186-380) ----------------------------
    def color_optical_flow(self, flow_x, flow_y, max_magnitude=None, ord: float = 1.0):
        """HSV colorization; hue = angle, value = |flow|^ord
        (ref visualizer.py:336-380)."""
        flows = np.stack((flow_x, flow_y), axis=2)
        flows[np.isinf(flows)] = 0
        flows[np.isnan(flows)] = 0
        mag = np.linalg.norm(flows, axis=2) ** ord
        # angle from the sanitized components: NaN/inf inputs land at hue 0
        # instead of tripping an invalid-value uint8 cast
        ang = (np.arctan2(flows[:, :, 1], flows[:, :, 0]) + np.pi) * 180.0 / np.pi / 2.0
        hsv = np.zeros(flow_x.shape + (3,), dtype=np.uint8)
        hsv[:, :, 0] = ang.astype(np.uint8)
        hsv[:, :, 1] = 255
        if max_magnitude is None:
            max_magnitude = mag.max()
        hsv[:, :, 2] = np.clip(255 * mag / (max_magnitude + 1e-12), 0, 255).astype(np.uint8)
        flow_rgb = _hsv_to_rgb_uint8(hsv)

        n = flow_x.shape[0]
        xx, yy = np.meshgrid(np.linspace(-1, 1, n), np.linspace(-1, 1, n))
        wmag = np.linalg.norm(np.stack((xx, yy), axis=2), axis=2)
        wang = (np.arctan2(xx, yy) + np.pi) * 180 / np.pi / 2.0
        hsv = np.zeros((n, n, 3), dtype=np.uint8)
        hsv[:, :, 0] = wang.astype(np.uint8)
        hsv[:, :, 1] = 255
        hsv[:, :, 2] = (255 * wmag / wmag.max()).astype(np.uint8)
        color_wheel = _hsv_to_rgb_uint8(hsv)
        return flow_rgb, color_wheel, max_magnitude

    def visualize_optical_flow(self, flow_x, flow_y, visualize_color_wheel=True,
                               file_prefix=None, save_flow=False, ord: float = 0.5):
        if save_flow:
            save_name = self.get_filename_from_prefix(file_prefix).replace("png", "npy")
            np.save(save_name, np.stack([flow_x, flow_y], axis=0))
            self.rollback_save_count(file_prefix)
        flow_rgb, color_wheel, _ = self.color_optical_flow(flow_x, flow_y, ord=ord)
        image = Image.fromarray(flow_rgb)
        self._show_or_save_image(image, file_prefix)
        if visualize_color_wheel:
            self._show_or_save_image(Image.fromarray(color_wheel), fixed_file_name="color_wheel")
        return image

    def visualize_overlay_optical_flow_on_event(self, flow, events, file_prefix=None, ord: float = 0.5):
        _show, _save = self._show, self._save
        self._show, self._save = False, False
        try:
            flow_image = self.visualize_optical_flow(np.asarray(flow)[0], np.asarray(flow)[1], ord=ord)
            flow_image.putalpha(int(255 * 0.8))
            if np.asarray(events).ndim == 2 and np.asarray(events).shape[1] == 4:
                event_image = self.visualize_event(np.asarray(events), grayscale=False).convert("RGB")
            else:
                event_image = self.visualize_image(np.asarray(events)).convert("RGB")
            event_image.putalpha(255 - int(255 * 0.8))
            flow_image.paste(event_image, None, event_image)
        finally:
            self._show, self._save = _show, _save
        self._show_or_save_image(flow_image, file_prefix)
        return flow_image

    def _numpy_event_mask(self, events) -> np.ndarray:
        """[1, H, W] bool mask of pixels receiving any bilinear vote —
        host-side numpy equivalent of ops.iwe.event_mask for all-positive
        unit weights (eager jax dispatch costs seconds/frame through a
        tunneled runtime)."""
        h, w = self._image_size
        x = np.asarray(events[:, 0], np.float64)
        y = np.asarray(events[:, 1], np.float64)
        fx = np.floor(x + 1e-6)
        fy = np.floor(y + 1e-6)
        gx, gy = x - fx, y - fy
        mask = np.zeros((h, w), bool)
        for dx, wx in ((0, 1.0 - gx), (1, gx)):
            for dy, wy in ((0, 1.0 - gy), (1, gy)):
                xi = fx.astype(np.int64) + dx
                yi = fy.astype(np.int64) + dy
                # != 0 like the device (iwe != 0): the floor(+eps) frac can
                # be a tiny NEGATIVE number just below integer coordinates
                ok = (wx * wy != 0) & (0 <= xi) & (xi < h) & (0 <= yi) & (yi < w)
                mask[xi[ok], yi[ok]] = True
        return mask[None]

    def visualize_optical_flow_on_event_mask(self, flow, events, file_prefix=None,
                                             ord: float = 0.5, max_color_on_mask: bool = True):
        _show, _save = self._show, self._save
        self._show, self._save = False, False
        try:
            mask = self._numpy_event_mask(np.asarray(events))
            flow = np.asarray(flow)
            if max_color_on_mask:
                masked = flow * mask
                image = self.visualize_optical_flow(masked[0], masked[1], False, file_prefix, ord=ord)
            else:
                image = self.visualize_optical_flow(flow[0], flow[1], False, file_prefix, ord=ord)
            pil_mask = Image.fromarray((~mask)[0]).convert("1")
            white = Image.new("RGB", image.size, (255, 255, 255))
            masked_image = Image.composite(white, image, pil_mask)
        finally:
            self._show, self._save = _show, _save
        self._show_or_save_image(masked_image, file_prefix)
        return masked_image

    def visualize_optical_flow_pred_and_gt(self, flow_pred, flow_gt, visualize_color_wheel=True,
                                           pred_file_prefix=None, gt_file_prefix=None, ord: float = 0.5):
        """Shared max-magnitude colorization (ref visualizer.py:297-334)."""
        _, _, max_pred = self.color_optical_flow(flow_pred[0], flow_pred[1], ord=ord)
        _, _, max_gt = self.color_optical_flow(flow_gt[0], flow_gt[1], ord=ord)
        mm = max(max_pred, max_gt)
        color_pred, _, _ = self.color_optical_flow(flow_pred[0], flow_pred[1], mm, ord=ord)
        color_gt, wheel, _ = self.color_optical_flow(flow_gt[0], flow_gt[1], mm, ord=ord)
        self._show_or_save_image(Image.fromarray(color_pred), pred_file_prefix)
        self._show_or_save_image(Image.fromarray(color_gt), gt_file_prefix)
        if visualize_color_wheel:
            self._show_or_save_image(Image.fromarray(wheel), fixed_file_name="color_wheel")

    # --- events --------------------------------------------------------------
    def visualize_event(self, events, grayscale: bool = True, background_color: int = 127,
                        ignore_polarity: bool = False, file_prefix=None) -> Image.Image:
        events = np.array(events, copy=True)
        events[:, 0] = np.clip(events[:, 0], 0, self._image_size[0] - 1)
        events[:, 1] = np.clip(events[:, 1], 0, self._image_size[1] - 1)
        if grayscale:
            image = np.ones(self._image_size)
            indices = (events[:, 0].astype(np.int32), events[:, 1].astype(np.int32))
            if ignore_polarity:
                np.add.at(image, indices, 1.0)
            else:
                pol = events[:, 3] * 2 - 1 if np.min(events[:, 3]) == 0 else events[:, 3]
                np.add.at(image, indices, pol)
            return self.visualize_event_image(image, background_color, file_prefix)
        image = np.full(self._image_size + (3,), 255, dtype=np.uint8)
        colors = np.where(events[:, 3:4] == 1, np.array([[255, 0, 0]]), np.array([[0, 0, 255]]))
        image[events[:, 0].astype(np.int32), events[:, 1].astype(np.int32)] = colors
        pil = Image.fromarray(image)
        self._show_or_save_image(pil, file_prefix)
        return pil

    def visualize_event_image(self, eventimage, background_color: int = 255, file_prefix=None) -> Image.Image:
        background = eventimage == 0
        rng = eventimage.max() - eventimage.min()
        eventimage = (255 * (eventimage - eventimage.min()) / (rng + 1e-12)).astype(np.uint8)
        if background_color == 255:
            eventimage = 255 - eventimage
        else:
            eventimage[background] = background_color
        pil = Image.fromarray(eventimage)
        self._show_or_save_image(pil, file_prefix)
        return pil

    def save_array(self, array: np.ndarray, file_prefix=None, new_prefix: bool = False) -> None:
        save_name = self.get_filename_from_prefix(file_prefix).replace("png", "npy")
        np.save(save_name, array)
        if not new_prefix:
            self.rollback_save_count(file_prefix)

    # --- history -------------------------------------------------------------
    def visualize_scipy_history(self, cost_history: dict, cost_weight: Optional[dict] = None):
        import matplotlib

        matplotlib.use("Agg")
        from matplotlib import pyplot as plt

        plt.figure()
        for k in cost_history.keys():
            if k == "loss" or cost_weight is None or k not in cost_weight:
                plt.plot(np.array(cost_history[k]), label=k)
            else:
                w = cost_weight[k]
                w = 1.0 if w == "inv" else w
                plt.plot(np.array(cost_history[k]) * w, label=k)
        plt.legend()
        if self._save:
            plt.savefig(self.get_filename_from_prefix("optimization_steps"))
        if self._show:
            plt.show(block=False)
        plt.close()

    def visualize_sampling_history(self, losses, file_prefix: str = "sampling_steps"):
        """History plot for the sampling ('optuna') optimizer path — the
        reference references undefined visualize_optuna_history/study
        (latent bug, ref base.py:701-702); this is the working equivalent."""
        self.visualize_scipy_history({"loss": list(np.asarray(losses).reshape(-1))})
