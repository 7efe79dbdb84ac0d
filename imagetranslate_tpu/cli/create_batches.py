"""Doc-level LM binarizer CLI (reference: create_batches.py): fixed-seq_len
blind-split vectors in N.pkl blocks + info.txt header."""
import argparse

def main(argv=None):
    p = argparse.ArgumentParser("create_batches")
    p.add_argument("--data", dest="data_path", required=True)
    p.add_argument("--cache", dest="cache_path", required=True)
    p.add_argument("--tok", dest="tokenizer_path", required=True)
    p.add_argument("--seq_len", type=int, default=512)
    p.add_argument("--block", dest="sen_block_size", type=int, default=10000)
    p.add_argument("--packed", action="store_true",
                   help="write blocks in the first-party ITR1 record format")
    options = p.parse_args(argv)

    from imagetranslate_tpu.data.binarize import write_doc_blocks
    from imagetranslate_tpu.text.processor import TextProcessor

    tp = TextProcessor(options.tokenizer_path)
    n = write_doc_blocks(tp, options.data_path, options.cache_path,
                         seq_len=options.seq_len,
                         sen_block_size=options.sen_block_size,
                         packed=options.packed)
    print(f"Wrote {n} blocks")

if __name__ == "__main__":
    main()
