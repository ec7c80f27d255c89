"""Per-layer intermediate tensor dump for on-target comparison.

Port of aimet_torch/layer_output_utils.py: saves every (quantized) op
output over given inputs to disk, named by product, so device outputs can
be diffed against simulation bit-for-bit.
"""
from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import numpy as np

from ..quantsim.qsim import QuantizationSimModel


class LayerOutputUtil:
    def __init__(self, sim: QuantizationSimModel, save_dir: str,
                 mode: str = "quantized"):
        self.sim = sim
        self.save_dir = save_dir
        self.mode = mode
        os.makedirs(save_dir, exist_ok=True)
        self.product_names = [op.output.name for op in sim.graph.ops]

    def generate_layer_outputs(self, params, batch, batch_index: int = 0):
        args = batch if isinstance(batch, (tuple, list)) else (batch,)
        caps = self.sim.collect_activations(
            params, args, self.product_names, mode=self.mode)
        batch_dir = os.path.join(self.save_dir, f"batch_{batch_index}")
        os.makedirs(batch_dir, exist_ok=True)
        manifest = {}
        for name, val in caps.items():
            fname = name.replace("/", "_").replace(".", "_") + ".npy"
            np.save(os.path.join(batch_dir, fname), np.asarray(val))
            manifest[name] = fname
        with open(os.path.join(batch_dir, "manifest.json"), "w") as f:
            json.dump(manifest, f, indent=2, sort_keys=True)
        return manifest
