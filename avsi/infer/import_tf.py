"""TF-checkpoint interchange with the reference implementation.

The reference trains with `tf.contrib.cudnn_rnn.CudnnLSTM` and serves with
`CudnnCompatibleLSTMCell` + `stack_bidirectional_dynamic_rnn`
(models.py:94-115); TF's CudnnOpaqueParamsSaveable stores the training
params in checkpoints under the SAME cudnn-compatible canonical names the
inference graph uses, which is how the reference's own
`inference_model_generator.py:40-47` restores them.  That canonical form
— per layer, per direction, one `kernel (in+H, 4H)` and one `bias (4H)`
under `.../stack_bidirectional_rnn/cell_<k>/bidirectional_rnn/<fw|bw>/
cudnn_compatible_lstm_cell/` — is therefore the interchange format, and
this module maps it to/from the avsi parameter tree so a user can bring
trained reference checkpoints into avsi (`import_tf_checkpoint`) or take
avsi-trained weights back to the reference tooling
(`export_tf_checkpoint`).

Layout facts this transcribes (NOT the reference's code):
  * gate order: `CudnnCompatibleLSTMCell` subclasses `LSTMCell`
    (forget_bias=0), whose gate columns are (i, j, f, o) with j the cell
    candidate; avsi's are (i, f, g, o) (core.py:_lstm_cell) -> column
    blocks 1 and 2 swap.
  * kernel stacks input rows on top of recurrent rows: avsi
    wx = kernel[:in_dim] (gate-permuted), wh = kernel[in_dim:].
  * variable scopes: top scope is config['model'] (training_ctc.py:85,
    training.py:82, inference.py:68) or 'asr/<model>' for the ASR net
    (training_asr.py:80); the two-steps model creates its own top scopes
    'v-blstm' and 'av-blstm-twosteps' (models.py:255-260); int_layer>0
    splits the stack into 'blstm_1'/'blstm_2' (models.py:905-917); heads
    are 'logits' (models.py:118), 'inpainting'+'asr' for the MTL classes
    (models.py:1592-1599), 'speaker_embedding/weights_1..3'
    (models.py:803-810).

Both directions are validated in tests/test_import_tf.py against real TF
checkpoints written with `tf.compat.v1.train.Saver` and an independent
numpy transcription of the TF cell.
"""

from __future__ import annotations

import re

import numpy as np

# optimizer slots / bookkeeping the reference Saver also writes
_SKIP_RE = re.compile(
    r"(^|/)(global_step|beta1_power|beta2_power)$|/(Adam|Adam_1|Momentum)$"
)
_CELL_RE = re.compile(
    r"^(?P<prefix>.*?)stack_bidirectional_rnn/cell_(?P<layer>\d+)"
    r"/bidirectional_rnn/(?P<dir>fw|bw)/[^/]+/(?P<leaf>kernel|bias)$"
)


def _tf_to_avsi_gates(arr: np.ndarray) -> np.ndarray:
    """Reorder gate columns (..., 4H): TF (i, j, f, o) -> avsi (i, f, g, o)."""
    i, j, f, o = np.split(arr, 4, axis=-1)
    return np.concatenate([i, f, j, o], axis=-1)


def _avsi_to_tf_gates(arr: np.ndarray) -> np.ndarray:
    """Inverse of _tf_to_avsi_gates: (i, f, g, o) -> (i, j, f, o)."""
    i, f, g, o = np.split(arr, 4, axis=-1)
    return np.concatenate([i, g, f, o], axis=-1)


def _stack_key(prefix: str, template: dict) -> tuple:
    """Map a checkpoint scope prefix to the avsi subtree holding the stack.

    Matching is on whole path segments (substring matching would confuse
    'v-blstm' with 'av-blstm'), and the twosteps sub-scopes only apply
    when the model actually IS twosteps (template has 'vnet') — a
    standalone v-blstm checkpoint's top scope is also 'v-blstm'.
    """
    parts = prefix.split("/")
    if "vnet" in template:
        if "v-blstm" in parts:
            return ("vnet", "blstm")
        if "av-blstm-twosteps" in parts:
            return ("avnet", "blstm")
    if "blstm_1" in parts:
        return ("blstm1",)
    if "blstm_2" in parts:
        return ("blstm2",)
    return ("blstm",)


def _get_path(tree, path):
    node = tree
    for p in path:
        node = node[p]
    return node


def _set_path(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node[p]
    node[path[-1]] = value


def _head_path(name: str, template: dict) -> tuple | None:
    """Map a non-LSTM checkpoint variable name to an avsi tree path."""
    m = re.search(r"speaker_embedding/(weights|biases)_(\d)$", name)
    if m:
        return ("ssnn", int(m.group(2)) - 1, "w" if m.group(1) == "weights" else "b")
    m = re.search(r"(inpainting|asr|logits)/(weights|biases)$", name)
    if not m:
        return None
    leaf = "w" if m.group(2) == "weights" else "b"
    scope = m.group(1)
    if scope == "inpainting":
        return ("head_ipt", leaf)
    if scope == "asr":
        return ("head_asr", leaf)
    # 'logits': the single head of the plain SI net, the ASR net, or a
    # two-steps sub-net, depending on enclosing scope / template keys
    # (segment matching, not substring: 'av-blstm' contains 'v-blstm')
    parts = name.split("/")
    if "vnet" in template:
        if "v-blstm" in parts:
            return ("vnet", "head_ipt", leaf)
        if "av-blstm-twosteps" in parts:
            return ("avnet", "head_ipt", leaf)
    if "head" in template:  # ASR net (avsi/models/asr.py)
        return ("head", leaf)
    return ("head_ipt", leaf)


def use_cpu_backend() -> None:
    """Pin jax to the host CPU for checkpoint interchange.

    Import/export is pure host work (npz <-> TF checkpoint); on the axon
    TPU relay, letting model-template init land on the device would push
    every parameter through the slow host<->device tunnel for nothing.
    The env var route (JAX_PLATFORMS=cpu) is ignored for standalone
    scripts here (sitecustomize pre-registers axon), so this must be an
    in-process config update, and it must run before first jax use.
    """
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass  # backend already initialized; caller accepts device placement


def read_tf_variables(tf_ckpt_path: str) -> dict[str, np.ndarray]:
    """Read every variable from a TF checkpoint (no graph building)."""
    import tensorflow as tf  # baked into the environment; used read-only

    reader = tf.train.load_checkpoint(tf_ckpt_path)
    names = sorted(reader.get_variable_to_shape_map())
    if any(name.endswith("opaque_kernel") for name in names):
        raise ValueError(
            "checkpoint stores raw CudnnLSTM opaque params (GPU-only blob); "
            "re-save it with the reference's inference_model_generator / "
            "rename_vars_tf_ckp.py first, which converts to the canonical "
            "cudnn-compatible form this importer reads"
        )
    return {n: np.asarray(reader.get_tensor(n)) for n in names}


def map_tf_to_params(tf_vars: dict[str, np.ndarray], template: dict) -> dict:
    """Map reference-named TF variables onto a copy of `template`.

    Raises with the full lists of unmapped checkpoint variables and
    unfilled template leaves if the mapping is not a bijection.
    """
    import jax

    filled = jax.tree_util.tree_map(lambda _: None, template)
    consumed = set()

    # --- LSTM stacks: group (prefix, layer) -> {(dir, leaf): value}
    groups: dict[tuple, dict] = {}
    for name, val in tf_vars.items():
        m = _CELL_RE.match(name)
        if not m:
            continue
        key = (m.group("prefix"), int(m.group("layer")))
        groups.setdefault(key, {})[(m.group("dir"), m.group("leaf"))] = val
        consumed.add(name)

    for (prefix, layer), parts in groups.items():
        missing = {(d, l) for d in ("fw", "bw") for l in ("kernel", "bias")} - set(parts)
        if missing:
            raise ValueError(f"incomplete LSTM cell {prefix}cell_{layer}: missing {missing}")
        hidden = parts[("fw", "bias")].shape[0] // 4
        in_dim = parts[("fw", "kernel")].shape[0] - hidden
        wx = np.stack([parts[(d, "kernel")][:in_dim] for d in ("fw", "bw")])
        wh = np.stack([parts[(d, "kernel")][in_dim:] for d in ("fw", "bw")])
        b = np.stack([parts[(d, "bias")] for d in ("fw", "bw")])
        layer_dict = {
            "wx": _tf_to_avsi_gates(wx),
            "wh": _tf_to_avsi_gates(wh),
            "b": _tf_to_avsi_gates(b),
        }
        path = _stack_key(prefix, template) + (layer,)
        try:
            target = _get_path(template, path)
        except (KeyError, IndexError, TypeError):
            raise ValueError(f"checkpoint has LSTM stack at {path} absent from model")
        for k in ("wx", "wh", "b"):
            if tuple(target[k].shape) != tuple(layer_dict[k].shape):
                raise ValueError(
                    f"shape mismatch at {path + (k,)}: checkpoint "
                    f"{layer_dict[k].shape} vs model {target[k].shape}"
                )
        _set_path(filled, path, layer_dict)

    # --- heads / MLPs
    for name, val in tf_vars.items():
        if name in consumed or _SKIP_RE.search(name):
            consumed.add(name)
            continue
        path = _head_path(name, template)
        if path is None:
            raise ValueError(f"unrecognized checkpoint variable: {name}")
        target = _get_path(template, path)
        if tuple(target.shape) != tuple(val.shape):
            raise ValueError(
                f"shape mismatch at {path}: checkpoint {val.shape} "
                f"vs model {tuple(target.shape)}"
            )
        _set_path(filled, path, val.astype(np.float32))
        consumed.add(name)

    # --- completeness: every template leaf must now be filled.
    # Leaves stay host-side numpy: imports feed save_checkpoint (npz), and
    # device placement over the axon tunnel would cost minutes for nothing.
    is_leaf = lambda x: x is None or not isinstance(x, (dict, list))  # noqa: E731
    leaves_f, treedef = jax.tree_util.tree_flatten(filled, is_leaf=is_leaf)
    if any(l is None for l in leaves_f):
        # report which paths are unfilled
        paths = jax.tree_util.tree_flatten_with_path(filled, is_leaf=is_leaf)[0]
        missing = [jax.tree_util.keystr(p) for p, v in paths if v is None]
        raise ValueError(f"checkpoint leaves model params unfilled: {missing}")
    return jax.tree_util.tree_unflatten(
        treedef, [np.asarray(l, dtype=np.float32) for l in leaves_f]
    )


def model_template(config: dict, is_asr: bool = False) -> dict:
    """The freshly-initialized parameter tree import/export map against."""
    import jax

    if is_asr:
        from avsi.models import asr as asr_model

        return asr_model.init(jax.random.PRNGKey(0), config)
    from avsi.models import registry

    return registry.get_model(config["model"]).init(jax.random.PRNGKey(0), config)


def import_tf_checkpoint(tf_ckpt_path: str, config: dict, is_asr: bool = False) -> dict:
    """Load a reference TF checkpoint as an avsi parameter tree."""
    return map_tf_to_params(
        read_tf_variables(tf_ckpt_path), model_template(config, is_asr)
    )


# ---------------------------------------------------------------------------
# export: avsi params -> reference-named TF checkpoint
# ---------------------------------------------------------------------------

def _tf_names_for_stack(scope: str, layers: list) -> dict[str, np.ndarray]:
    out = {}
    for k, layer in enumerate(layers):
        wx = _avsi_to_tf_gates(np.asarray(layer["wx"], np.float32))
        wh = _avsi_to_tf_gates(np.asarray(layer["wh"], np.float32))
        b = _avsi_to_tf_gates(np.asarray(layer["b"], np.float32))
        for d, di in (("fw", 0), ("bw", 1)):
            base = (
                f"{scope}/stack_bidirectional_rnn/cell_{k}/bidirectional_rnn/"
                f"{d}/cudnn_compatible_lstm_cell"
            )
            out[f"{base}/kernel"] = np.concatenate([wx[di], wh[di]], axis=0)
            out[f"{base}/bias"] = b[di]
    return out


def params_to_tf_variables(params: dict, config: dict, is_asr: bool = False) -> dict[str, np.ndarray]:
    """Name every avsi parameter the way the reference inference graph does."""
    model = str(config["model"])
    out: dict[str, np.ndarray] = {}

    def head(scope, p):
        out[f"{scope}/weights"] = np.asarray(p["w"], np.float32)
        out[f"{scope}/biases"] = np.asarray(p["b"], np.float32)

    if "vnet" in params:  # two-steps (models.py:255-260: own top scopes)
        out.update(_tf_names_for_stack("v-blstm/cudnn_lstm", params["vnet"]["blstm"]))
        head("v-blstm/logits", params["vnet"]["head_ipt"])
        out.update(
            _tf_names_for_stack("av-blstm-twosteps/cudnn_lstm", params["avnet"]["blstm"])
        )
        head("av-blstm-twosteps/logits", params["avnet"]["head_ipt"])
        return out

    top = f"asr/{model}" if is_asr else model
    if "blstm" in params:
        out.update(_tf_names_for_stack(f"{top}/cudnn_lstm", params["blstm"]))
    if "blstm1" in params:
        out.update(_tf_names_for_stack(f"{top}/blstm_1/cudnn_lstm", params["blstm1"]))
        out.update(_tf_names_for_stack(f"{top}/blstm_2/cudnn_lstm", params["blstm2"]))
    if "ssnn" in params:
        for i, p in enumerate(params["ssnn"]):
            out[f"{top}/speaker_embedding/weights_{i + 1}"] = np.asarray(p["w"], np.float32)
            out[f"{top}/speaker_embedding/biases_{i + 1}"] = np.asarray(p["b"], np.float32)
    if "head_asr" in params:  # MTL classes: 'inpainting' + 'asr' heads
        head(f"{top}/inpainting", params["head_ipt"])
        head(f"{top}/asr", params["head_asr"])
    elif "head_ipt" in params:
        head(f"{top}/logits", params["head_ipt"])
    elif "head" in params:  # ASR net
        head(f"{top}/logits", params["head"])
    return out


def export_tf_checkpoint(
    params: dict, config: dict, out_prefix: str, is_asr: bool = False
) -> str:
    """Write avsi params as a TF checkpoint the reference tooling can restore."""
    import os

    os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
    import tensorflow as tf

    tf_vars = params_to_tf_variables(params, config, is_asr)
    g = tf.Graph()
    with g.as_default():
        for name, val in tf_vars.items():
            tf.compat.v1.get_variable(name, initializer=val)
        saver = tf.compat.v1.train.Saver()
        with tf.compat.v1.Session(graph=g) as sess:
            sess.run(tf.compat.v1.global_variables_initializer())
            path = saver.save(sess, out_prefix)
    return path
