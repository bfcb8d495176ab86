"""Child process for the multi-process Trainer.fit test (not collected).

Usage: python _mh_fit_child.py <pid> <nprocs> <result_dir> <teacher_ckpt>
Env: MH_COORD=127.0.0.1:<port>
"""

import os
import sys

pid, nprocs = int(sys.argv[1]), int(sys.argv[2])
result_dir, ckpt = sys.argv[3], sys.argv[4]

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_enable_async_dispatch", False)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distillclip_tpu.parallel import initialize_distributed

assert initialize_distributed(
    coordinator_address=os.environ["MH_COORD"], num_processes=nprocs, process_id=pid
)

from distillclip_tpu.data.datamodule import MainDataModule
from distillclip_tpu.models import RepeatTextTransformer
from distillclip_tpu.training import DistillTask
from distillclip_tpu.training.trainer import Trainer

task = DistillTask(
    student=RepeatTextTransformer(
        vocab_size=512, context_length=16, out_dim=48, embed_dim=32,
        depth=2, num_heads=4, repeated_times=2,
    ),
    loss_control_para={"loss_name": ["out_l1", "out_cos"]},
    teacher_name=ckpt, model_type="text",
    lr=1e-2, warm_steps=1, total_steps=4,
)
dm = MainDataModule(
    dataset="synthetic", dataset_name="SyntheticTextDataset",
    dataset_para={"size": 64, "context_length": 16, "vocab_size": 512,
                  "embed_dim": 48},
    train_batch_size=8, val_batch_size=8, num_workers=1,
)
trainer = Trainer(max_epochs=1, result_dir=result_dir, run_name="mhfit",
                  log_every_n_steps=1)
out = trainer.fit(task, dm)
print(f"MHFIT {pid} devices={jax.device_count()} "
      f"procs={jax.process_count()} OK")
