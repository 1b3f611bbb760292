"""``cgat-train`` / ``train-CGAT``: training entry point
(reference: CGAT/train.py:22-144).

Fresh training, resume (``--ckp``), and transfer learning
(``--pretrained-model`` for a full fine-tune, ``--only-residual`` to train
just the output head).
"""
from __future__ import annotations

import argparse

from .common import add_model_args, add_trainer_args, configs_from_args


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_trainer_args(p)
    add_model_args(p)
    args = p.parse_args(argv)

    from ..training.trainer import Trainer, load_trainer, resume_trainer
    tcfg, mcfg = configs_from_args(args)
    print(tcfg)
    print(mcfg)

    if args.pretrained_model:
        # transfer learning: reuse pretrained params + stored normalisation,
        # train on the new data (train.py:28-33)
        trainer, params, _ = load_trainer(
            args.pretrained_model, train=False)
        new_trainer = Trainer(tcfg, trainer.model_cfg)
        state = new_trainer.init_state(params=params)
        state = new_trainer.fit(state)
    elif args.ckp:
        # exact resume: optimizer moments + epoch + schedule state restored
        # (reference resume_from_checkpoint, train.py:64-76)
        try:
            trainer, state, meta = resume_trainer(args.ckp, tag="last")
        except FileNotFoundError:
            trainer, state, meta = resume_trainer(args.ckp, tag="best")
        state = trainer.fit(
            state, epochs=tcfg.epochs,
            start_epoch=int(meta.get("epoch", -1)) + 1,
            best_val=float(meta.get("best_val", meta.get("val_mae", "inf"))),
            plateau_state=meta.get("plateau"),
            last_val_mae=meta.get("val_mae"))
    else:
        trainer = Trainer(tcfg, mcfg)
        state = trainer.fit()

    print("training done")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
