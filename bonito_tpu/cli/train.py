"""
Training CLI: workdir setup, config/pretrained resolution, data loading,
Trainer.fit. Flow mirrors the reference (bonito/cli/train.py:20-105).
"""

import os
import sys
from argparse import ArgumentParser, ArgumentDefaultsHelpFormatter
from pathlib import Path

from bonito_tpu import models as model_zoo
from bonito_tpu.config import load_config, save_config
from bonito_tpu.data import (
    ComputeSettings, DataSettings, ModelSetup, load_data,
)
from bonito_tpu import schedule as schedules
from bonito_tpu.util import load_symbol, model_directory, init
from bonito_tpu.training import Trainer


def main(args):
    workdir = Path(args.training_directory)
    if workdir.exists() and not args.force:
        sys.stderr.write(f"[error] {workdir} exists, use -f to force continue "
                         "training or delete it.\n")
        sys.exit(1)

    init(args.seed)

    if args.distributed:
        # multi-host data parallelism: the Trainer's mesh then spans all
        # hosts; each host draws a disjoint slice of the chunk files
        # (data.py shards by process index), gradients sync via GSPMD
        # collectives over ICI/DCN
        from bonito_tpu import parallel
        parallel.init_distributed(args.coordinator_address)
        import jax
        sys.stderr.write(
            f"[distributed: host {jax.process_index()}"
            f"/{jax.process_count()}]\n")

    if args.pretrained:
        dirname = model_directory(args.pretrained)
        pretrain_file = dirname / "config.toml"
        config = load_config(pretrain_file)
        if "lr_scheduler" in config:
            sys.stderr.write(
                f"[ignoring 'lr_scheduler' in --pretrained config]\n")
            del config["lr_scheduler"]
    elif args.config and os.path.exists(args.config):
        config = load_config(args.config)
    elif args.config:
        config = model_zoo.get_config(args.config)
    else:
        sys.stderr.write("[error] --config or --pretrained is required\n")
        sys.exit(1)

    sys.stderr.write(f"[loading model]\n")
    if args.pretrained:
        sys.stderr.write(f"[using pretrained model {args.pretrained}]\n")
        from bonito_tpu.util import load_model
        model = load_model(args.pretrained, half=False)
    else:
        Model = load_symbol(config, "Model")
        model = Model(config)
        model.init()

    sys.stderr.write(f"[loading data]\n")
    data = DataSettings(
        training_data=args.directory,
        num_train_chunks=args.chunks,
        num_valid_chunks=args.valid_chunks,
        output_dir=str(workdir),
    )
    setup = ModelSetup(
        n_pre_context_bases=getattr(model, "n_pre_context_bases", 0),
        n_post_context_bases=getattr(model, "n_post_context_bases", 0),
        standardisation=config.get("standardisation", {}),
    )
    compute = ComputeSettings(
        batch_size=args.batch, num_workers=args.num_workers, seed=args.seed)

    train_loader, valid_loader = load_data(data, setup, compute)

    os.makedirs(workdir, exist_ok=True)

    # workdir config embeds the full invocation + dataset metadata so the
    # model dir is self-describing (reference: cli/train.py:42-44,73-78)
    config["training"] = {
        k: (str(v) if isinstance(v, Path) else v)
        for k, v in vars(args).items()
        if v is not None and not callable(v)
    }
    config["training"]["pwd"] = os.getcwd()
    # dataset.py plugins may contribute metadata fields
    # (reference: cli/train.py:74-78)
    dataset_cfg = getattr(
        getattr(train_loader, "dataset", None), "dataset_config", None)
    save_config({**config, **(dataset_cfg or {})}, workdir / "config.toml")

    lr_scheduler_fn = None
    if "lr_scheduler" in config:
        sched_config = dict(config["lr_scheduler"])
        if "package" in sched_config:
            # reference configs name the builder by package/symbol
            # (cli/train.py:80-86); map the reference package here
            from importlib import import_module
            package = sched_config["package"].replace(
                "bonito.", "bonito_tpu.")
            builder = getattr(import_module(package), sched_config["symbol"])
            lr_scheduler_fn = builder(**sched_config)
        else:
            builder = getattr(schedules, sched_config.pop(
                "type", "linear_warmup_cosine_decay"))
            lr_scheduler_fn = builder(**sched_config)

    ds = getattr(train_loader, "dataset", None)
    chunks_per_epoch = args.chunks or (len(ds) if ds is not None else 0)
    import jax as _jax
    if _jax.process_count() > 1 and args.chunks:
        # --chunks is the GLOBAL count but each host's loader holds only
        # its share; the LR schedule must track the steps a host
        # actually runs per epoch
        chunks_per_epoch = args.chunks // _jax.process_count()

    trainer = Trainer(
        model, train_loader, valid_loader,
        use_amp=not args.no_amp,
        lr_scheduler_fn=lr_scheduler_fn,
        restore_optim=args.restore_optim,
        save_optim_every=args.save_optim_every,
        grad_accum_split=args.grad_accum_split,
        quantile_grad_clip=args.quantile_grad_clip,
        chunks_per_epoch=chunks_per_epoch,
        batch_size=args.batch,
    )

    # the CLI lr always wins over any [optim] lr, as in the reference
    # (cli/train.py:100-105 + training.py:228); comma-separated values
    # become a per-group list for pluggable optimizers
    if "," in str(args.lr):
        lr = [float(x) for x in str(args.lr).split(",")]
    else:
        lr = float(args.lr)
    optim_kwargs = dict(config.get("optim", {}))
    optim_kwargs.pop("lr", None)
    trainer.fit(workdir, args.epochs, lr, **optim_kwargs)


def argparser():
    parser = ArgumentParser(
        formatter_class=ArgumentDefaultsHelpFormatter, add_help=False)
    parser.add_argument("training_directory")
    group = parser.add_mutually_exclusive_group()
    # same default architecture as the reference (cli/train.py:114)
    group.add_argument("--config", default="dna_r9.4.1@v3.1")
    group.add_argument("--pretrained", default="")
    parser.add_argument("--directory", type=Path, required=True)
    # a string so "2e-3,1e-3" can carry per-group rates to a pluggable
    # optimizer, as in the reference (cli/train.py:100-103)
    parser.add_argument("--lr", default="2e-3")
    parser.add_argument("--seed", default=25, type=int)
    parser.add_argument("--epochs", default=5, type=int)
    parser.add_argument("--batch", default=64, type=int)
    parser.add_argument("--chunks", default=0, type=int)
    parser.add_argument("--valid-chunks", default=None, type=int)
    parser.add_argument("--no-amp", action="store_true", default=False)
    parser.add_argument("-f", "--force", action="store_true", default=False)
    parser.add_argument("--restore-optim", action="store_true", default=False)
    parser.add_argument("--nondeterministic", action="store_true",
                        default=False,
                        help="accepted for reference compatibility (relaxes "
                             "cudnn determinism there; XLA is deterministic)")
    parser.add_argument("--device", default=None,
                        help="accepted for reference compatibility; "
                             "compute always runs on the JAX default device")
    parser.add_argument("--num-workers", default=4, type=int)
    parser.add_argument("--save-optim-every", default=10, type=int)
    parser.add_argument("--grad-accum-split", default=1, type=int)
    # on by default, as in the reference (cli/train.py:130-133)
    clip_group = parser.add_mutually_exclusive_group()
    clip_group.add_argument("--quantile-grad-clip", dest="quantile_grad_clip",
                            action="store_true")
    clip_group.add_argument("--no-quantile-grad-clip",
                            dest="quantile_grad_clip", action="store_false")
    clip_group.set_defaults(quantile_grad_clip=True)
    parser.add_argument("--distributed", action="store_true", default=False,
                        help="multi-host data-parallel training "
                             "(jax.distributed init + per-host data shard)")
    parser.add_argument("--coordinator-address", default=None,
                        help="host:port of process 0 (auto-discovered on "
                             "TPU pods when omitted)")
    return parser
