"""SenSim training CLI (reference: train_txt_sim.py __main__). Parallel .mt
training data + monolingual MASS-shard negative pools (--src-neg/--dst-neg)."""

from __future__ import annotations

import argparse
import os


def get_parser():
    p = argparse.ArgumentParser("train_sensim")
    p.add_argument("--tok", dest="tokenizer_path", required=True)
    p.add_argument("--model", dest="model_path", required=True)
    p.add_argument("--pretrained", dest="pretrained_path", default=None)
    p.add_argument("--train_mt", dest="mt_train_path", required=True)
    p.add_argument("--dev_mt", dest="mt_dev_path", default=None)
    p.add_argument("--src-neg", dest="src_neg", required=True)
    p.add_argument("--dst-neg", dest="dst_neg", required=True)
    p.add_argument("--step", type=int, default=125000)
    p.add_argument("--batch", type=int, default=20000)
    p.add_argument("--capacity", dest="total_capacity", type=int, default=600)
    p.add_argument("--max_seq_len", type=int, default=175)
    p.add_argument("--lr", dest="learning_rate", type=float, default=0.0001)
    p.add_argument("--warmup", type=int, default=12500)
    p.add_argument("--clip", type=float, default=1.0)
    p.add_argument("--enc", dest="encoder_layer", type=int, default=6)
    p.add_argument("--embed", dest="embed_dim", type=int, default=768)
    p.add_argument("--intermediate", dest="intermediate_layer_dim", type=int,
                   default=3072)
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--mesh", dest="mesh_spec", default="",
                   help="device mesh 'DATAxMODEL' (e.g. 8, 4x2, auto)")
    return p


def main(argv=None):
    options = get_parser().parse_args(argv)
    from imagetranslate_tpu.parallel.mesh import init_distributed, parse_mesh

    init_distributed()
    mesh = parse_mesh(options.mesh_spec)

    from imagetranslate_tpu.data.binarize import load_mass, load_mt
    from imagetranslate_tpu.data.loader import MassBatcher, MTBatcher
    from imagetranslate_tpu.models.config import Seq2SeqConfig
    from imagetranslate_tpu.text.processor import TextProcessor
    from imagetranslate_tpu.train.trainer_sensim import SenSimTrainer

    tp = TextProcessor(options.tokenizer_path)
    assert tp.pad_token_id() == 0
    cfg = Seq2SeqConfig(
        vocab_size=tp.vocab_size(),
        num_languages=max(1, len(tp.languages)),
        hidden_size=options.embed_dim,
        intermediate_size=options.intermediate_layer_dim,
        enc_layers=options.encoder_layer,
        dropout=options.dropout, attention_dropout=options.dropout,
        dtype=options.dtype)
    trainer = SenSimTrainer(cfg, tp, mesh=mesh, lr=options.learning_rate,
                            warmup=options.warmup, clip=options.clip)

    if options.pretrained_path:
        from imagetranslate_tpu.train.checkpoint import load_checkpoint

        # init_from_lm parity (sen_sim.py:33-34): reuse a pretrained MT
        # encoder; shared module names make this a subtree copy.
        params, _, _ = load_checkpoint(options.pretrained_path,
                                       trainer.state.params)
        trainer.state = trainer.state.replace(params=params)

    pad = tp.pad_token_id()
    mt_batcher = MTBatcher(load_mt(options.mt_train_path), pad_id=pad,
                           max_batch=options.batch // 2,
                           capacity_mb=options.total_capacity // 2,
                           max_seq_len=options.max_seq_len)
    src_neg = MassBatcher(load_mass(options.src_neg), pad_id=pad,
                          max_batch=options.batch * 5,
                          capacity_mb=options.total_capacity * 5,
                          max_seq_len=options.max_seq_len)
    dst_neg = MassBatcher(load_mass(options.dst_neg), pad_id=pad,
                          max_batch=options.batch * 5,
                          capacity_mb=options.total_capacity * 5,
                          max_seq_len=options.max_seq_len)
    dev_batcher = None
    if options.mt_dev_path:
        dev_batcher = MTBatcher(load_mt(options.mt_dev_path), pad_id=pad,
                                max_batch=options.batch // 10,
                                capacity_mb=options.total_capacity)

    os.makedirs(options.model_path, exist_ok=True)
    step, epoch = 0, 0
    while step < options.step:
        print(f"train epoch {epoch}")
        step = trainer.train_epoch(step, options.model_path, mt_batcher,
                                   src_neg, dst_neg, dev_batcher,
                                   max_step=options.step, epoch_seed=epoch)
        epoch += 1
    print("Finished Training!")


if __name__ == "__main__":
    main()
