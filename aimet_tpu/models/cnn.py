"""Small hand-written test models — the zoo equivalent of the reference's
torch/test/python/models/test_models.py fixtures."""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class TinyMLP(nn.Module):
    features: int = 32
    num_classes: int = 10

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.features)(x)
        x = nn.relu(x)
        x = nn.Dense(self.features)(x)
        x = nn.relu(x)
        x = nn.Dense(self.num_classes)(x)
        return x


class TinyCNN(nn.Module):
    """conv-bn-relu-pool x2 -> dense; mirrors the reference's mnist model
    (test/python/models/mnist_torch_model.py)."""
    num_classes: int = 10

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(8, (3, 3), padding="SAME", use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=True)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.Conv(16, (3, 3), padding="SAME")(x)
        x = nn.relu(x)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape((x.shape[0], -1))
        x = nn.Dense(self.num_classes)(x)
        return x


class ConvBnRelu(nn.Module):
    """Single conv-bn-relu block for fold/CLE unit tests."""
    features: int = 8
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=self.use_bias)(x)
        x = nn.BatchNorm(use_running_average=True)(x)
        x = nn.relu(x)
        return x


class ResidualBlockNet(nn.Module):
    """Two dense layers with a skip connection (Add supergroup tests)."""
    features: int = 16

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.features)(x)
        h2 = nn.relu(nn.Dense(self.features)(h))
        out = h + h2
        out = nn.relu(out)
        return nn.Dense(4)(out)


def init_model(model: nn.Module, input_shape, seed: int = 0):
    """Convenience: returns (variables, example_input)."""
    x = jnp.ones(input_shape, jnp.float32)
    variables = model.init(jax.random.PRNGKey(seed), x)
    return variables, x
