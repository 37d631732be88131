"""Checkpoint loading must not be a code-execution primitive.

The reference's checkpoint format IS one (torch.load = pickle,
reference evaluate.py:31-36): anyone who can get a file opened by the
evaluator — or by a serving daemon that hot-reloads client-named paths —
runs arbitrary code.  vad_tpu keeps the same self-describing single-file
contract but loads through a restricted Unpickler
(vad_tpu/utils/checkpoint.py) that only resolves numpy array
reconstruction and optax state namedtuples, and the HTTP daemon fences
POST /v1/reload to configured directory roots.
"""

from __future__ import annotations

import json
import pickle
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vad_tpu.utils.checkpoint import (
    load_checkpoint,
    load_checkpoint_bytes,
    save_checkpoint,
)


class _Payload:
    """Classic pickle RCE shape: __reduce__ returning a callable."""

    def __init__(self, fn, *args):
        self._r = (fn, args)

    def __reduce__(self):
        return self._r


class TestRestrictedUnpickler:
    def test_os_system_payload_refused(self, tmp_path):
        import os

        marker = tmp_path / "pwned"
        evil = tmp_path / "evil.ckpt"
        evil.write_bytes(pickle.dumps(_Payload(os.system, f"touch {marker}")))
        with pytest.raises(pickle.UnpicklingError, match="disallowed global"):
            load_checkpoint(evil)
        assert not marker.exists()

    @pytest.mark.parametrize(
        "fn_modname",
        [("builtins", "eval"), ("builtins", "exec"), ("builtins", "getattr"),
         ("subprocess", "Popen"), ("shutil", "rmtree")],
    )
    def test_dangerous_globals_refused(self, fn_modname):
        import importlib

        mod, name = fn_modname
        fn = getattr(importlib.import_module(mod), name)
        evil = pickle.dumps(_Payload(fn, "x"))
        with pytest.raises(pickle.UnpicklingError, match="disallowed global"):
            load_checkpoint_bytes(evil)

    def test_nested_payload_refused(self):
        """The payload hides inside an innocent-looking checkpoint dict."""
        import os

        evil = pickle.dumps({"model_type": "video", "params": {},
                             "epoch": _Payload(os.getcwd)})
        with pytest.raises(pickle.UnpicklingError):
            load_checkpoint_bytes(evil)

    def test_real_checkpoint_roundtrips(self, tmp_path):
        """Everything a trainer writes — params, batch_stats, optimizer
        state (optax namedtuples), history, args — survives the
        restricted loader bit-exactly."""
        from vad_tpu.models.autoencoder import ConvAutoencoder
        from vad_tpu.train.state import create_train_state

        model = ConvAutoencoder(latent_dim=16)
        variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)),
                               train=False)
        state = create_train_state(model, variables, 1e-3)
        # one real update so Adam moments are non-trivial arrays
        grads = jax.tree.map(jnp.ones_like, state.params)
        state = state.apply_gradients(grads=grads)
        payload = {
            "epoch": 3,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "train_loss": 0.5,
            "history": {"train_loss": [1.0, 0.5], "val_loss": [0.9, 0.6]},
            "args": {"category": "bottle", "image_size": 32, "lr": 1e-3,
                     "resume": None, "debug": False},
            "model_type": "image",
            "score_threshold": np.float32(0.12),
        }
        p = save_checkpoint(tmp_path / "m.ckpt", payload)
        loaded = load_checkpoint(p)
        assert loaded["epoch"] == 3 and loaded["args"]["category"] == "bottle"
        for a, b in zip(jax.tree.leaves(payload["params"]),
                        jax.tree.leaves(loaded["params"])):
            np.testing.assert_array_equal(np.asarray(a), b)
        # optimizer state keeps its optax structure (resume contract)
        assert type(loaded["opt_state"]).__name__ == type(state.opt_state).__name__
        for a, b in zip(jax.tree.leaves(payload["opt_state"]),
                        jax.tree.leaves(loaded["opt_state"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestReloadPathFence:
    """POST /v1/reload only opens files under the configured roots."""

    @pytest.fixture(scope="class")
    def img_server(self, tmp_path_factory):
        from vad_tpu.eval.http_server import ImageScoringService, ScoringServer
        from vad_tpu.models.autoencoder import ConvAutoencoder

        root = tmp_path_factory.mktemp("reload_root")
        model = ConvAutoencoder(latent_dim=16)
        v = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), train=False)
        svc = ImageScoringService(model, v, 32, batch=2, dtype=jnp.float32)
        srv = ScoringServer(service=svc, host="127.0.0.1", port=0,
                            reload_roots=[root])
        srv.start_background()
        yield srv, root, model, v
        srv.close()

    def _reload(self, srv, path):
        import http.client

        conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=30)
        body = json.dumps({"checkpoint": str(path)}).encode()
        conn.request("POST", "/v1/reload", body=body)
        resp = conn.getresponse()
        out = json.loads(resp.read().decode())
        conn.close()
        return resp.status, out

    def test_outside_root_403(self, img_server, tmp_path):
        srv, root, model, v = img_server
        outside = tmp_path / "outside.ckpt"  # NOT under the reload root
        save_checkpoint(outside, {"model_type": "image", "params": v["params"],
                                  "batch_stats": v["batch_stats"]})
        status, r = self._reload(srv, outside)
        assert status == 403 and "outside the allowed reload roots" in r["error"]

    def test_traversal_403(self, img_server):
        srv, root, *_ = img_server
        status, r = self._reload(srv, root / ".." / ".." / "etc" / "x.ckpt")
        assert status == 403

    def test_inside_root_allowed(self, img_server):
        srv, root, model, v = img_server
        ok = root / "new.ckpt"
        save_checkpoint(ok, {"model_type": "image", "params": v["params"],
                             "batch_stats": v["batch_stats"]})
        status, r = self._reload(srv, ok)
        assert status == 200 and r["model_type"] == "image"

    def test_malicious_pickle_inside_root_400(self, img_server):
        """Even a file INSIDE the fence cannot execute code: the
        restricted unpickler turns it into a clean 400 and the daemon
        keeps serving."""
        import os

        srv, root, *_ = img_server
        marker = root / "pwned"
        evil = root / "evil.ckpt"
        evil.write_bytes(pickle.dumps(_Payload(os.system, f"touch {marker}")))
        status, r = self._reload(srv, evil)
        assert status == 400 and "disallowed global" in r["error"]
        assert not marker.exists()
        # daemon alive and healthy afterwards
        import http.client

        conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=30)
        conn.request("GET", "/v1/health")
        assert conn.getresponse().status == 200
        conn.close()

    def test_no_roots_disables_reload(self):
        from vad_tpu.eval.http_server import ImageScoringService, ScoringServer
        from vad_tpu.models.autoencoder import ConvAutoencoder

        model = ConvAutoencoder(latent_dim=16)
        v = model.init(jax.random.key(1), jnp.zeros((1, 32, 32, 3)), train=False)
        svc = ImageScoringService(model, v, 32, batch=2, dtype=jnp.float32)
        srv = ScoringServer(service=svc, host="127.0.0.1", port=0)
        srv.start_background()
        try:
            status, r = self._reload(srv, "/anything.ckpt")
            assert status == 403 and "reload is disabled" in r["error"]
        finally:
            srv.close()

    def test_roots_derived_from_served_checkpoint(self, tmp_path):
        """With no explicit roots, the served checkpoint's run dir IS the
        root (serve.py's default posture)."""
        from vad_tpu.eval.http_server import ImageScoringService, ScoringServer
        from vad_tpu.models.autoencoder import ConvAutoencoder

        run = tmp_path / "cat_20260101_000000"
        model = ConvAutoencoder(latent_dim=16)
        v = model.init(jax.random.key(2), jnp.zeros((1, 32, 32, 3)), train=False)
        ck = run / "best_model.ckpt"
        save_checkpoint(ck, {"model_type": "image", "params": v["params"],
                             "batch_stats": v["batch_stats"]})
        svc = ImageScoringService(model, v, 32, batch=2, dtype=jnp.float32)
        svc.checkpoint = str(ck)
        srv = ScoringServer(service=svc, host="127.0.0.1", port=0)
        assert srv.reload_roots == [run.resolve()]
        srv.start_background()
        try:
            sibling = run / "checkpoint_epoch_2.ckpt"
            save_checkpoint(sibling, {"model_type": "image",
                                      "params": v["params"],
                                      "batch_stats": v["batch_stats"]})
            status, r = self._reload(srv, sibling)
            assert status == 200
            status, r = self._reload(srv, tmp_path / "elsewhere.ckpt")
            assert status == 403
        finally:
            srv.close()
