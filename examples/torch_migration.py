"""Torch migration: bring an existing torch model into the TPU quantsim.

The reference is a torch toolkit, so its users start from ``nn.Module``s.
``from_torch`` fx-traces the module into a pure JAX ``fn(params, *inputs)``
and the rest of the pipeline is identical to the JAX-native path:
calibrate -> quantized forward -> export encodings.

Run: python examples/torch_migration.py  (CPU ok; TPU if available)
"""
import numpy as np


def main():
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    import jax
    import jax.numpy as jnp

    from aimet_tpu import QuantizationSimModel, from_torch

    class TorchNet(nn.Module):
        """A typical user CNN: conv/bn/relu blocks + residual + classifier."""

        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 16, 3, stride=2, padding=1, bias=False)
            self.bn1 = nn.BatchNorm2d(16)
            self.conv2 = nn.Conv2d(16, 16, 3, padding=1)
            self.conv3 = nn.Conv2d(16, 32, 1)
            self.pool = nn.AdaptiveAvgPool2d(1)
            self.fc = nn.Linear(32, 10)

        def forward(self, x):
            x = F.relu(self.bn1(self.conv1(x)))
            x = F.relu(x + self.conv2(x))
            x = F.relu(self.conv3(x))
            x = torch.flatten(self.pool(x), 1)
            return self.fc(x)

    torch.manual_seed(0)
    model = TorchNet().eval()

    # 1. import: torch.fx graph -> pure JAX fn + param pytree
    fn, params = from_torch(model)
    x_t = torch.randn(2, 3, 16, 16)
    x = jnp.asarray(x_t.numpy())
    with torch.no_grad():
        torch_out = model(x_t).numpy()
    jax_out = np.asarray(fn(params, x))
    print("import max |torch - jax|:", float(np.abs(torch_out - jax_out).max()))

    # 2. quantsim over the imported function (NCHW conv weights -> per-channel
    #    axis 0, like the reference's torch frontend)
    sim = QuantizationSimModel(fn, (params, x))
    rng = np.random.RandomState(0)
    batches = [jnp.asarray(rng.randn(2, 3, 16, 16).astype(np.float32))
               for _ in range(4)]
    sim.compute_encodings(params, iter(batches))
    print(f"calibrated {len(sim.encodings)} quantizers")

    # 3. quantized inference + export (AIMET-format encodings JSON)
    q = jax.jit(sim.quantized_fn)(params, x)
    rel = float(np.mean((np.asarray(q) - jax_out) ** 2)
                / (np.mean(jax_out ** 2) + 1e-9))
    print("INT8 sim relative MSE vs FP:", rel)
    sim.export("/tmp", "torch_migration")
    print("exported /tmp/torch_migration.encodings")


if __name__ == "__main__":
    main()
