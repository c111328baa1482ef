"""Stage-II CLI end-to-end on the synthetic fixture: train 1 epoch, eval,
check refined frames are written."""
import os

import numpy as np
import pytest

from sahs_tpu.config import Config
from sahs_tpu.data.synthetic import write_synthetic_dataset


@pytest.mark.slow
def test_stage2_train_and_eval_cli(tmp_path):
    import imageio.v2 as imageio

    basedir = str(tmp_path / "audio_ds")
    write_synthetic_dataset(basedir, kind="audio", num_frames=2, H=32, W=32)
    # Stage-I "renders": reuse the GT frames as the raw inputs
    renders = str(tmp_path / "renders")
    os.makedirs(renders, exist_ok=True)
    import shutil
    for i in range(2):
        shutil.copy(os.path.join(basedir, "com_imgs", f"{i}.jpg"),
                    os.path.join(renders, f"{i}.jpg"))

    cfg_path = str(tmp_path / "cfg.yml")
    with open(cfg_path, "w") as fp:
        fp.write(f"""
experiment:
  id: s2test
  logdir: {tmp_path}/log
dataset:
  type: audio
  basedir: {basedir}
texture_refine:
  lr_G: 0.0001
  texture_photo: "{basedir}/com_imgs/0.jpg"
  train_basedir: "{renders}"
  test_basedir: "{renders}"
  val_basedir: "{renders}"
  train_num: 2
  test_num: 2
  val_num: 2
  epochs: 1
  epochs_decay: 0
  log_iters: 1
""")
    from sahs_tpu.cli.train_stage2 import main as train_main
    train_main(["--config", cfg_path, "--max-epochs", "1"])

    ckpts = [f for f in os.listdir(str(tmp_path / "log" / "s2test_stage2"))
             if f.endswith(".ckpt")]
    assert ckpts, "stage2 checkpoint not written"

    from sahs_tpu.cli.eval_stage2 import main as eval_main
    outdir = str(tmp_path / "refined")
    eval_main(["--config", cfg_path, "--checkpoint",
               os.path.join(str(tmp_path / "log" / "s2test_stage2"), ckpts[0]),
               "--savedir", outdir])
    outs = sorted(os.listdir(outdir))
    assert len(outs) == 2
    img = imageio.imread(os.path.join(outdir, outs[0]))
    assert img.shape == (32, 32, 3)
    assert np.isfinite(img.astype(np.float32)).all()
