import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neo360_tpu.nn.resnet import (ResNet34Features, SpatialEncoder,
                                  convert_torch_state_dict, index_latent)


def test_pyramid_shapes():
    model = ResNet34Features()
    x = jnp.zeros((1, 64, 96, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x, False)
    feats = model.apply(vars_, x, False)
    assert [f.shape for f in feats] == [
        (1, 32, 48, 64), (1, 16, 24, 64), (1, 8, 12, 128), (1, 4, 6, 256)]


def test_spatial_encoder_latent_512():
    model = SpatialEncoder()
    x = jnp.zeros((2, 48, 64, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x, False)
    latent = model.apply(vars_, x, False)
    assert latent.shape == (2, 24, 32, 512)


def test_index_latent_center_and_mask():
    latent = jnp.arange(2 * 4 * 6 * 3, dtype=jnp.float32).reshape(2, 4, 6, 3)
    # pixel uv in an (12, 8) image (w=12, h=8); center pixel -> center of latent
    uv = jnp.asarray([[[5.5, 3.5], [100.0, 3.5]]] * 2)
    samples, mask = index_latent(latent, uv, image_size=(12, 8))
    assert samples.shape == (2, 2, 3)
    m = np.asarray(mask)
    assert m[0, 0].all() and not m[0, 1].all()


def test_torch_weight_conversion_matches():
    """Build a torch resnet34-layout state dict with torch.nn primitives and
    check the converted Flax model reproduces torch's forward exactly."""
    torch = pytest.importorskip("torch")
    tnn = torch.nn

    g = torch.Generator().manual_seed(0)

    def conv_w(o, i, k):
        return torch.randn(o, i, k, k, generator=g) * 0.05

    sd = {}

    def add_bn(name, c):
        sd[f"{name}.weight"] = torch.rand(c, generator=g) + 0.5
        sd[f"{name}.bias"] = torch.randn(c, generator=g) * 0.1
        sd[f"{name}.running_mean"] = torch.randn(c, generator=g) * 0.1
        sd[f"{name}.running_var"] = torch.rand(c, generator=g) + 0.5

    sd["conv1.weight"] = conv_w(64, 3, 7)
    add_bn("bn1", 64)
    stage_sizes = (3, 4, 6)
    widths = (64, 128, 256)
    in_c = 64
    for s, (blocks, w) in enumerate(zip(stage_sizes, widths)):
        for b in range(blocks):
            name = f"layer{s + 1}.{b}"
            cin = in_c if b == 0 else w
            sd[f"{name}.conv1.weight"] = conv_w(w, cin, 3)
            sd[f"{name}.conv2.weight"] = conv_w(w, w, 3)
            add_bn(f"{name}.bn1", w)
            add_bn(f"{name}.bn2", w)
            if b == 0 and s > 0:
                sd[f"{name}.downsample.0.weight"] = conv_w(w, cin, 1)
                add_bn(f"{name}.downsample.1", w)
        in_c = w

    # torch forward (architecture mirrors torchvision resnet34 conv1..layer3)
    def t_bn(x, name):
        return tnn.functional.batch_norm(
            x, sd[f"{name}.running_mean"], sd[f"{name}.running_var"],
            sd[f"{name}.weight"], sd[f"{name}.bias"], False, 0.1, 1e-5)

    def t_block(x, name, stride, downsample):
        idt = x
        y = tnn.functional.conv2d(x, sd[f"{name}.conv1.weight"],
                                  stride=stride, padding=1)
        y = tnn.functional.relu(t_bn(y, f"{name}.bn1"))
        y = tnn.functional.conv2d(y, sd[f"{name}.conv2.weight"], padding=1)
        y = t_bn(y, f"{name}.bn2")
        if downsample:
            idt = tnn.functional.conv2d(x, sd[f"{name}.downsample.0.weight"],
                                        stride=stride)
            idt = t_bn(idt, f"{name}.downsample.1")
        return tnn.functional.relu(y + idt)

    x_np = np.random.default_rng(1).normal(size=(1, 3, 32, 48)).astype(
        np.float32)
    with torch.no_grad():
        x = torch.from_numpy(x_np)
        x = tnn.functional.conv2d(x, sd["conv1.weight"], stride=2, padding=3)
        x = tnn.functional.relu(t_bn(x, "bn1"))
        feats_t = [x]
        x = tnn.functional.max_pool2d(x, 3, 2, 1)
        for s, (blocks, w) in enumerate(zip(stage_sizes, widths)):
            for b in range(blocks):
                x = t_block(x, f"layer{s + 1}.{b}",
                            2 if (b == 0 and s > 0) else 1,
                            b == 0 and s > 0)
            feats_t.append(x)

    variables = convert_torch_state_dict(
        {k: v.numpy() for k, v in sd.items()})
    model = ResNet34Features()
    feats_j = model.apply(variables, jnp.asarray(
        x_np.transpose(0, 2, 3, 1)), False)

    for ft, fj in zip(feats_t, feats_j):
        ref = ft.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(fj), ref,
                                   rtol=1e-4, atol=1e-4 * np.abs(ref).max())
