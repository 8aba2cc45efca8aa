"""Load reference PyTorch ``.pth`` checkpoints into the framework.

The reference saves WHOLE pickled modules — ``torch.save(self.dnn, ...)``
(reference ``train.py:178-179``) — and reloads them with ``torch.load`` at
inference time (reference ``test.py:35-42``). A user migrating from the
reference therefore owns ``model_<iter>.pth`` files whose pickle stream
references the class ``dnn.DNN``. This module converts such files (and plain
``state_dict`` saves) into the framework's parameter pytree, so existing
trained models keep working without retraining:

    params = params_from_torch_file("model_10000.pth")
    # or: pinn-tpu test --config config_CMB.json --model model_10000.pth

Design notes (TPU-native rebuild, not a port): torch is used ONLY as a
host-side deserializer here — the tensors are immediately converted to
numpy/jnp and all compute stays on the JAX path. Unpickling a whole module
does not need the reference's source: pickle restores an ``nn.Module`` via
``__class__`` + ``__dict__`` (``__init__`` never runs), so a stub class
registered under the module/class names the stream mentions is sufficient.
"""

from __future__ import annotations

import sys
import types

import numpy as np

# Module/class names the reference's pickle streams reference
# (reference train.py:178 pickles instances of dnn.DNN).
_STUB_TARGETS = (("dnn", "DNN"),)


def _ensure_stub_modules(torch) -> tuple[list, list]:
    """Register minimal stand-in classes so whole-module pickles resolve.

    Only installs a stub when the named module (or its class attribute) is
    absent — if the user has already imported the real reference module,
    that is used instead. Returns ``(module_names, (module, attr) pairs)``
    WE installed, so the caller can undo both after the load (a lingering
    stub module would shadow a later real ``import dnn``; a stub attribute
    set on a pre-existing foreign module would mutate it permanently).
    """
    installed_modules, installed_attrs = [], []
    for mod_name, cls_name in _STUB_TARGETS:
        mod = sys.modules.get(mod_name)
        if mod is not None and hasattr(mod, cls_name):
            continue
        if mod is None:
            mod = types.ModuleType(mod_name)
            mod.__doc__ = "pinn_depthestimation_tpu stub for torch unpickling"
            sys.modules[mod_name] = mod
            installed_modules.append(mod_name)
        else:
            installed_attrs.append((mod, cls_name))
        stub = type(cls_name, (torch.nn.Module,), {"__module__": mod_name})
        setattr(mod, cls_name, stub)
    return installed_modules, installed_attrs


def _linears_from_module(torch, module) -> list:
    """The reference net is a Sequential of Linear/activation/Dropout
    (reference ``dnn.py:25-40``); traversal order == layer order."""
    return [m for m in module.modules() if isinstance(m, torch.nn.Linear)]


def _linears_from_state_dict(state_dict) -> list:
    """Pair ``<prefix>.weight`` / ``<prefix>.bias`` entries in LAYER order.

    Dict insertion order is registration order for a freshly saved
    Sequential, but a re-serialized state_dict (sorted keys, safetensors
    round-trip) can arrive permuted — and with uniform hidden widths no
    shape check would catch scrambled layers. When every prefix carries a
    layer index (the reference's ``layers.layer_<i>``), sort by it;
    otherwise fall back to insertion order.
    """
    import re

    entries = []
    for key, value in state_dict.items():
        if key.endswith(".weight"):
            prefix = key[: -len(".weight")]
            bias_key = prefix + ".bias"
            if bias_key not in state_dict:
                raise ValueError(f"no bias found for {key!r}")
            nums = re.findall(r"\d+", prefix)
            entries.append((prefix, nums, value, state_dict[bias_key]))
    if not entries:
        raise ValueError("no '<prefix>.weight' entries found in state_dict")
    if all(nums for _, nums, _, _ in entries):
        entries.sort(key=lambda e: [int(n) for n in e[1]])
    return [(w, b) for _, _, w, b in entries]


def params_from_torch_linears(weights_and_biases) -> dict:
    """(weight (out,in), bias (out,)) sequence -> framework parameter pytree.

    Torch stores Linear weights as (out_features, in_features); the
    framework's ``mlp_apply`` uses (in, out) — transposed here once.
    """
    wb = [
        (np.asarray(w, dtype=np.float32).T, np.asarray(b, dtype=np.float32))
        for w, b in weights_and_biases
    ]
    if len(wb) < 2:
        raise ValueError(f"need at least input+output layers, got {len(wb)}")
    (w_in, b_in), hidden, (w_out, b_out) = wb[0], wb[1:-1], wb[-1]
    width = w_in.shape[1]
    for i, (w, b) in enumerate(hidden):
        if w.shape != (width, width):
            raise ValueError(
                f"hidden layer {i} has shape {w.shape}, expected ({width}, {width})"
            )
    if w_out.shape[0] != width:
        raise ValueError(
            f"output layer expects {w_out.shape[0]} inputs but the last "
            f"hidden width is {width} — inconsistent state_dict layer order"
        )
    if hidden:
        w_hidden = np.stack([w for w, _ in hidden])
        b_hidden = np.stack([b for _, b in hidden])
    else:
        w_hidden = np.zeros((0, width, width), np.float32)
        b_hidden = np.zeros((0, width), np.float32)
    return {
        "w_in": w_in, "b_in": b_in,
        "w_hidden": w_hidden, "b_hidden": b_hidden,
        "w_out": w_out, "b_out": b_out,
    }


def params_from_torch_file(path: str, spec=None) -> dict:
    """Load a reference ``.pth`` checkpoint -> framework parameter pytree.

    Accepts both formats in the wild: a whole pickled ``dnn.DNN`` module
    (what the reference training loop saves) and a bare ``state_dict``.
    ``spec`` (an :class:`~pinn_depthestimation_tpu.models.MLPSpec`) enables
    architecture validation against the config.

    Tries ``weights_only=True`` first (safe for ``state_dict`` saves); only
    whole-module pickles fall back to full unpickling, which executes
    arbitrary constructors by design — a loud warning names the file, and
    such ``.pth`` files must be trusted (the same caveat applies to the
    reference's own ``test.py:35``).
    """
    import torch  # host-side deserialization only

    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except (OSError, EOFError):
        # Missing/unreadable/truncated file: not an unpickling-trust issue —
        # surface the real error instead of retrying the unsafe path on it.
        raise
    except Exception:
        print(
            f"warning: {path!r} is not a plain state_dict; falling back to "
            "full unpickling (executes code from the file — trusted "
            "checkpoints only)",
            file=sys.stderr,
        )
        installed_modules, installed_attrs = _ensure_stub_modules(torch)
        try:
            obj = torch.load(path, map_location="cpu", weights_only=False)
        finally:
            for name in installed_modules:  # don't shadow a later `import dnn`
                sys.modules.pop(name, None)
            for mod, attr in installed_attrs:  # undo foreign-module mutation
                try:
                    delattr(mod, attr)
                except AttributeError:
                    pass
    if isinstance(obj, torch.nn.Module):
        linears = _linears_from_module(torch, obj)
        wb = [
            (lin.weight.detach().numpy(), lin.bias.detach().numpy())
            for lin in linears
        ]
    elif isinstance(obj, dict):
        wb = [
            (np.asarray(w.detach() if hasattr(w, "detach") else w),
             np.asarray(b.detach() if hasattr(b, "detach") else b))
            for w, b in _linears_from_state_dict(obj)
        ]
    else:
        raise ValueError(
            f"{path!r}: expected a pickled nn.Module or a state_dict, "
            f"got {type(obj).__name__}"
        )
    params = params_from_torch_linears(wb)
    if spec is not None:
        expect = (spec.d_in, spec.width, spec.n_hidden, spec.d_out)
        got = (
            params["w_in"].shape[0], params["w_in"].shape[1],
            params["w_hidden"].shape[0] + 1, params["w_out"].shape[1],
        )
        if expect != got:
            raise ValueError(
                f"{path!r} architecture (d_in, width, n_hidden, d_out)={got} "
                f"does not match the config's {expect}"
            )
    return params


def torch_state_dict_from_params(params: dict) -> dict:
    """Inverse of :func:`params_from_torch_file`: framework pytree -> torch
    ``state_dict`` in the reference's exact key layout
    (``layers.layer_<i>.weight`` / ``.bias``, reference ``dnn.py:35``), so
    the export loads straight into a freshly constructed reference ``DNN``
    with ``load_state_dict(strict=True)``. Weights are transposed back to
    torch's (out_features, in_features) storage.
    """
    import torch  # host-side serialization only

    if np.asarray(params["w_in"]).shape[1] == 0:
        raise ValueError(
            "cannot export a zero-hidden-layer parameter set: the reference "
            "DNN layout has no representation for it"
        )
    wb = [(params["w_in"], params["b_in"])]
    wb += list(zip(np.asarray(params["w_hidden"]), np.asarray(params["b_hidden"])))
    wb.append((params["w_out"], params["b_out"]))
    out = {}
    for i, (w, b) in enumerate(wb):
        out[f"layers.layer_{i}.weight"] = torch.tensor(
            np.asarray(w, dtype=np.float32).T
        )
        out[f"layers.layer_{i}.bias"] = torch.tensor(
            np.asarray(b, dtype=np.float32)
        )
    return out
