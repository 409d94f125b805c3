"""CLI end-to-end smoke tests + multi-device sharding tests (8 virtual CPU
devices, see conftest).
"""

import json
import os
import sys
from pathlib import Path

import cv2
import jax
import numpy as np
import pytest


class TestParallel:
    def test_mesh_and_shardings(self):
        from gcn_grabcut_tpu.parallel.mesh import (
            make_mesh, shard_graph_batch)
        from gcn_grabcut_tpu.core.graph import single_graph, stack_graphs
        mesh = make_mesh(n_data=4, n_graph=2)
        assert mesh.devices.shape == (4, 2)

        r = np.random.RandomState(0)
        gs = []
        for _ in range(8):
            x = r.randn(10, 19).astype(np.float32)
            src = np.concatenate([np.arange(9), np.arange(1, 10)])
            dst = np.concatenate([np.arange(1, 10), np.arange(9)])
            gs.append(single_graph(x, src, dst,
                                   r.rand(18, 5).astype(np.float32)))
        batch = stack_graphs(gs)
        sharded = shard_graph_batch(batch, mesh)
        assert sharded.x.sharding.spec[0] == "data"

    def test_edge_partitioned_aggregation_matches_dense(self):
        from gcn_grabcut_tpu.parallel.mesh import make_mesh
        from gcn_grabcut_tpu.parallel.partition import (
            partition_edges_by_dst, sharded_scatter_add)
        from jax.sharding import NamedSharding, PartitionSpec as P
        import jax.numpy as jnp

        mesh = make_mesh(n_data=2, n_graph=4)
        r = np.random.RandomState(1)
        n, e, d = 32, 120, 8
        src = r.randint(0, n, e).astype(np.int32)
        dst = r.randint(0, n, e).astype(np.int32)
        mask = (r.rand(e) > 0.1).astype(np.float32)
        x = r.randn(n, d).astype(np.float32)

        psrc, pdst, pmask = partition_edges_by_dst(src, dst, mask, n, 4)
        agg = sharded_scatter_add(mesh, n)
        sh_n = NamedSharding(mesh, P("graph", None))
        sh_e = NamedSharding(mesh, P("graph"))
        with mesh:
            out = jax.jit(agg)(
                jax.device_put(jnp.asarray(x), sh_n),
                jax.device_put(jnp.asarray(psrc), sh_e),
                jax.device_put(jnp.asarray(pdst), sh_e),
                jax.device_put(jnp.asarray(pmask), sh_e))
        ref = np.zeros_like(x)
        np.add.at(ref, dst[mask > 0], x[src[mask > 0]])
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)

    def test_dryrun_multichip(self):
        sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
        import __graft_entry__ as ge
        ge.dryrun_multichip(8)

    def test_entry_compiles(self):
        sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
        import __graft_entry__ as ge
        fn, (variables, batch) = ge.entry()
        out = jax.jit(fn)(variables, batch)
        assert out.shape[-1] == 3


class TestCLIs:
    def test_train_cli_synthetic(self, tmp_path):
        from gcn_grabcut_tpu.cli.train import main
        hist = main([
            "--synthetic", "10", "--epochs", "2", "--batch", "4",
            "--hidden", "24", "--layers", "2", "--n-segments", "40",
            "--save-dir", str(tmp_path / "ckpt"), "--no-bf16",
        ])
        assert len(hist["train_loss"]) == 2
        assert (tmp_path / "ckpt" / "final_model.msgpack").exists()

    def test_inference_cli(self, tmp_path, circle_image):
        from gcn_grabcut_tpu.cli.train import main as train_main
        from gcn_grabcut_tpu.cli.inference import main as infer_main

        train_main([
            "--synthetic", "8", "--epochs", "1", "--batch", "4",
            "--hidden", "24", "--layers", "2", "--n-segments", "40",
            "--save-dir", str(tmp_path / "ckpt"), "--no-bf16",
        ])
        img, _ = circle_image
        img_path = tmp_path / "img.png"
        cv2.imwrite(str(img_path), cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        infer_main([
            "--checkpoint", str(tmp_path / "ckpt" / "final_model.msgpack"),
            "--input", str(img_path),
            "--output-dir", str(tmp_path / "out"),
            "--n-segments", "60",
            "--save", "mask", "overlay", "trimap",
        ])
        assert (tmp_path / "out" / "img_mask.png").exists()
        assert (tmp_path / "out" / "img_overlay.png").exists()
        assert (tmp_path / "out" / "img_trimap.png").exists()

    def test_inference_cli_batch_mode(self, tmp_path, circle_image):
        """--batch groups same-shape images through segment_batch and
        emits identical per-file outputs; a shape change flushes."""
        from gcn_grabcut_tpu.cli.train import main as train_main
        from gcn_grabcut_tpu.cli.inference import main as infer_main

        train_main([
            "--synthetic", "8", "--epochs", "1", "--batch", "4",
            "--hidden", "24", "--layers", "2", "--n-segments", "40",
            "--save-dir", str(tmp_path / "ckpt"), "--no-bf16",
        ])
        img, _ = circle_image
        (tmp_path / "imgs").mkdir()
        for i in range(2):   # same shape -> one batch
            cv2.imwrite(str(tmp_path / "imgs" / f"a{i}.png"),
                        cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        # different shape -> its own flush
        other = cv2.resize(img, (img.shape[1] // 2, img.shape[0]))
        cv2.imwrite(str(tmp_path / "imgs" / "b.png"),
                    cv2.cvtColor(other, cv2.COLOR_RGB2BGR))
        infer_main([
            "--checkpoint", str(tmp_path / "ckpt" / "final_model.msgpack"),
            "--input", str(tmp_path / "imgs"),
            "--output-dir", str(tmp_path / "out"),
            "--n-segments", "40", "--batch", "4", "--save", "mask",
        ])
        for stem in ("a0", "a1", "b"):
            out = tmp_path / "out" / f"{stem}_mask.png"
            assert out.exists()
            m = cv2.imread(str(out), cv2.IMREAD_GRAYSCALE)
            assert set(np.unique(m)) <= {0, 255}

    def test_prepare_graphs_cli(self, tmp_path, circle_image):
        from gcn_grabcut_tpu.cli.prepare_graphs import main
        img, mask = circle_image
        (tmp_path / "imgs").mkdir()
        (tmp_path / "masks").mkdir()
        for i in range(2):
            cv2.imwrite(str(tmp_path / "imgs" / f"s{i}.png"),
                        cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
            cv2.imwrite(str(tmp_path / "masks" / f"s{i}.png"), mask * 255)
        main(["--images", str(tmp_path / "imgs"),
              "--masks", str(tmp_path / "masks"),
              "--cache-dir", str(tmp_path / "cache"),
              "--n-segments", "40"])
        cached = list((tmp_path / "cache").glob("*.npz"))
        assert len(cached) == 2


class TestVisualise:
    def test_all_plots_write_files(self, tmp_path, circle_image):
        from gcn_grabcut_tpu import visualise as vz
        from gcn_grabcut_tpu import build_graph, SuperpixelGraphConfig
        img, gt = circle_image
        rg = build_graph(img, SuperpixelGraphConfig(n_segments=60))

        hist = {"train_loss": [3, 2, 1], "val_loss": [3, 2.5, 2],
                "val_acc": [0.5, 0.6, 0.7], "val_iou_fg": [0.2, 0.3, 0.4],
                "val_score": [0.3, 0.4, 0.5], "lr": [1e-3, 5e-4, 1e-4]}
        vz.plot_training_curves(hist, tmp_path / "curves.png")

        trimap = np.random.RandomState(0).randint(
            0, 4, img.shape[:2]).astype(np.uint8)
        vz.plot_trimap_comparison(img, trimap, gt, gt, tmp_path / "cmp.png")
        vz.plot_graph_overlay(
            img, rg.segments, rg.centroids,
            np.asarray(rg.graph.edge_src[0]),
            np.asarray(rg.graph.edge_dst[0]),
            np.asarray(rg.graph.edge_mask[0]), tmp_path / "graph.png")
        preds = np.random.RandomState(0).randint(0, 3, 100)
        labels = np.random.RandomState(1).randint(0, 3, 100)
        vz.plot_confusion_matrix(preds, labels, tmp_path / "cm.png")
        vz.save_research_report(
            [{"image": img, "trimap": trimap, "binary_mask": gt,
              "gt_mask": gt}], tmp_path / "report.png")
        for f in ("curves.png", "cmp.png", "graph.png", "cm.png",
                  "report.png"):
            assert (tmp_path / f).stat().st_size > 0


class TestRingAggregation:
    def test_ring_matches_dense(self):
        """Ring (ppermute) halo exchange must equal the scatter oracle —
        the memory-scalable alternative to the all-gather path."""
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P
        from gcn_grabcut_tpu.parallel.mesh import make_mesh
        from gcn_grabcut_tpu.parallel.partition import (
            partition_edges_2d, ring_scatter_add)

        mesh = make_mesh(n_data=2, n_graph=4)
        r = np.random.RandomState(2)
        n, e, d = 64, 400, 16
        src = r.randint(0, n, e).astype(np.int32)
        dst = r.randint(0, n, e).astype(np.int32)
        mask = (r.rand(e) > 0.1).astype(np.float32)
        x = r.randn(n, d).astype(np.float32)

        s2, d2, m2 = partition_edges_2d(src, dst, mask, n, 4)
        agg = ring_scatter_add(mesh, n)
        sh_n = NamedSharding(mesh, P("graph", None))
        sh_b = NamedSharding(mesh, P("graph", None, None))
        with mesh:
            out = jax.jit(agg)(
                jax.device_put(jnp.asarray(x), sh_n),
                jax.device_put(jnp.asarray(s2), sh_b),
                jax.device_put(jnp.asarray(d2), sh_b),
                jax.device_put(jnp.asarray(m2), sh_b))
        ref = np.zeros_like(x)
        np.add.at(ref, dst[mask > 0], x[src[mask > 0]])
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


class TestTools:
    def test_make_demo_synthetic(self, tmp_path):
        sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
        import make_demo
        frames = make_demo.main(["--synthetic",
                                 "--out", str(tmp_path / "demo.gif"),
                                 "--n-segments", "40"])
        assert len(frames) == 5
        assert (tmp_path / "demo.gif").stat().st_size > 0

    def test_make_figures(self, tmp_path):
        sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
        import make_figures
        make_figures.main(["--out", str(tmp_path / "arch.png")])
        assert (tmp_path / "arch.png").stat().st_size > 0

    def test_evaluate_cli(self, tmp_path):
        from gcn_grabcut_tpu.cli.train import main as train_main
        from gcn_grabcut_tpu.cli.evaluate import main as eval_main
        train_main([
            "--synthetic", "8", "--epochs", "1", "--batch", "4",
            "--hidden", "24", "--layers", "2", "--n-segments", "40",
            "--save-dir", str(tmp_path / "ck"), "--no-bf16",
        ])
        report = eval_main([
            "--checkpoint", str(tmp_path / "ck" / "final_model.msgpack"),
            "--synthetic", "4", "--n-segments", "40",
            "--out", str(tmp_path / "report.json"),
        ])
        assert report["n"] == 4
        assert (tmp_path / "report.json").exists()


class TestInferenceFixedSize:
    def test_fixed_size_restores_original_geometry(self, tmp_path,
                                                   circle_image):
        from gcn_grabcut_tpu.cli.train import main as train_main
        from gcn_grabcut_tpu.cli.inference import main as infer_main
        train_main([
            "--synthetic", "8", "--epochs", "1", "--batch", "4",
            "--hidden", "24", "--layers", "2", "--n-segments", "40",
            "--save-dir", str(tmp_path / "ck"), "--no-bf16",
        ])
        img, _ = circle_image
        wide = cv2.resize(img, (180, 100))    # non-square original
        p = tmp_path / "wide.png"
        cv2.imwrite(str(p), cv2.cvtColor(wide, cv2.COLOR_RGB2BGR))
        infer_main([
            "--checkpoint", str(tmp_path / "ck" / "final_model.msgpack"),
            "--input", str(p), "--output-dir", str(tmp_path / "out"),
            "--n-segments", "40", "--max-size", "96", "--fixed-size",
            "--save", "mask",
        ])
        mask = cv2.imread(str(tmp_path / "out" / "wide_mask.png"),
                          cv2.IMREAD_GRAYSCALE)
        assert mask.shape == (100, 180)       # restored geometry


class TestServeCLI:
    def test_segment_and_health_endpoints(self, tmp_path, circle_image):
        """Spin the HTTP server on a tiny model and drive it with two
        concurrent clients (exercising the micro-batcher), plus /healthz
        and the error path."""
        import base64
        import json
        import threading
        import urllib.request

        from gcn_grabcut_tpu.cli.train import main as train_main
        from gcn_grabcut_tpu.cli.serve import build_server, parse_args

        train_main([
            "--synthetic", "8", "--epochs", "1", "--batch", "4",
            "--hidden", "24", "--layers", "2", "--n-segments", "40",
            "--save-dir", str(tmp_path / "ck"), "--no-bf16",
        ])
        args = parse_args([
            "--checkpoint", str(tmp_path / "ck" / "final_model.msgpack"),
            "--port", "0", "--size", "96", "--n-segments", "40",
            "--batch", "2", "--batch-wait-ms", "200", "--no-warmup",
        ])
        server, batcher = build_server(args)
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            img, _ = circle_image
            ok, png = cv2.imencode(".png",
                                   cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
            body = png.tobytes()

            results = {}

            def post(key, payload, ctype):
                req = urllib.request.Request(
                    f"http://127.0.0.1:{port}/segment", data=payload,
                    headers={"Content-Type": ctype})
                with urllib.request.urlopen(req, timeout=600) as r:
                    results[key] = json.loads(r.read())

            # two concurrent requests: one raw PNG, one JSON-b64 — the
            # batcher should coalesce them into one program call.
            js = json.dumps(
                {"image_b64": base64.b64encode(body).decode()}).encode()
            t1 = threading.Thread(target=post, args=("raw", body,
                                                     "image/png"))
            t2 = threading.Thread(target=post, args=("json", js,
                                                     "application/json"))
            t1.start(); t2.start(); t1.join(); t2.join()

            for key in ("raw", "json"):
                out = results[key]
                mask_png = base64.b64decode(out["mask_png_b64"])
                m = cv2.imdecode(np.frombuffer(mask_png, np.uint8),
                                 cv2.IMREAD_GRAYSCALE)
                assert m.shape == img.shape[:2]   # original geometry
                assert set(np.unique(m)) <= {0, 255}
                assert 0.0 <= out["fg_ratio"] <= 1.0
            assert batcher.served == 2

            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
                h = json.loads(r.read())
            assert h["ok"] and h["served"] == 2

            # undecodable image → 400, not a hung batch
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/segment", data=b"not an image",
                headers={"Content-Type": "image/png"})
            try:
                urllib.request.urlopen(req, timeout=60)
                assert False, "expected HTTP 400"
            except urllib.error.HTTPError as e:
                assert e.code == 400
        finally:
            server.shutdown()
            server.server_close()

    def test_multi_checkpoint_ensemble_serving(self, tmp_path, circle_image):
        """The README-recommended multi-checkpoint ensemble must be
        reachable from the serving layer: `--checkpoint a,b` loads the
        stacked-params ensemble and serves requests from it."""
        from gcn_grabcut_tpu.cli.train import main as train_main
        from gcn_grabcut_tpu.cli.serve import build_server, parse_args

        train_main([
            "--synthetic", "8", "--epochs", "1", "--batch", "4",
            "--hidden", "24", "--layers", "2", "--n-segments", "40",
            "--save-dir", str(tmp_path / "ck"), "--no-bf16",
        ])
        ck = tmp_path / "ck"
        members = [p for p in (ck / "final_model.msgpack",
                               ck / "best_model.msgpack") if p.exists()]
        assert members, "training saved no checkpoint"
        spec = ",".join(str(members[i % len(members)]) for i in range(2))
        args = parse_args([
            "--checkpoint", spec,
            "--port", "0", "--size", "96", "--n-segments", "40",
            "--batch", "2", "--batch-wait-ms", "50", "--no-warmup",
        ])
        server, batcher = build_server(args)
        try:
            img, _ = circle_image
            req = batcher.submit(img, {})
            assert req.event.wait(timeout=600)
            assert req.error is None
            mask, _dt = req.result
            assert mask.shape == img.shape[:2]
            assert set(np.unique(mask)) <= {0, 1}
        finally:
            server.server_close()
