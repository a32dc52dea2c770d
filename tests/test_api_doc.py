"""docs/API.md stays executable.

Extracts the guide's "60-second training loop" code block and runs it with
size substitutions (mnist-sized data, 1 epoch) so any public-API rename or
signature change breaks this test before it breaks a reader. The other
snippets' entry points are each gated by their own suites (test_train,
test_metrics, test_serve, test_viz, test_modelIO); this test pins the doc's
spelling of the composite flow.
"""

import os
import re

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _code_blocks():
    with open(os.path.join(REPO, "docs", "API.md")) as f:
        text = f.read()
    return re.findall(r"```python\n(.*?)```", text, flags=re.S)


def test_training_loop_snippet_runs(tmp_path):
    blocks = _code_blocks()
    assert blocks, "docs/API.md lost its python code blocks"
    snippet = blocks[0]
    for needle in ["get_dataloaders", "init_specific_model", "get_loss_f",
                   "Trainer(", "trainer(loader", "trainer.params"]:
        assert needle in snippet, needle

    # shrink to test scale: mnist-like 32x32 data, 1 epoch, tiny batch
    root = str(tmp_path / "mnist")
    os.makedirs(root)
    rng = np.random.RandomState(0)
    np.savez_compressed(
        os.path.join(root, "train32.npz"),
        imgs=(rng.rand(48, 32, 32, 1) * 255).astype(np.uint8),
        labels=np.arange(48) % 10)
    snippet = (snippet
               .replace('"dsprites", batch_size=256',
                        '"mnist", root=root, batch_size=16')
               .replace("img_size=(1, 64, 64)", "img_size=(1, 32, 32)")
               .replace("epochs=30", "epochs=1")
               .replace('save_dir="results/my_run"',
                        "save_dir=str(tmp_path / 'run')"))
    ns = {"root": root, "tmp_path": tmp_path}
    exec(compile(snippet, "docs/API.md[block 0]", "exec"), ns)

    params = ns["params"]
    assert "encoder" in params and "decoder" in params
    assert os.path.exists(str(tmp_path / "run" / "train_losses.log"))


def test_doc_names_exist():
    """Every dotted API name the guide mentions must import."""
    import importlib
    for mod, names in {
        "disvae_tpu": ["Trainer", "Evaluator", "get_loss_f",
                       "init_specific_model"],
        "disvae_tpu.ops.precision": ["configure"],
        "disvae_tpu.ops.losses": ["BetaHLoss", "BetaBLoss", "BtcvaeLoss",
                                  "FactorKLoss"],
        "disvae_tpu.utils.modelIO": ["save_model", "load_model",
                                     "load_checkpoints"],
        "disvae_tpu.parallel.mesh": ["create_mesh"],
        "disvae_tpu.parallel.distributed": ["initialize"],
        "disvae_tpu.serve": ["ServingModel", "export_artifacts",
                             "load_artifact"],
        "disvae_tpu.utils.visualize": ["Visualizer", "GifTraversalsTraining"],
        "disvae_tpu.data.datasets": ["get_dataloaders"],
    }.items():
        m = importlib.import_module(mod)
        for name in names:
            assert hasattr(m, name), (mod, name)
