"""COCO annotation JSON -> caption binary (reference: binarize_coco_data.py)."""
import argparse

def main(argv=None):
    p = argparse.ArgumentParser("binarize_coco_data")
    p.add_argument("--file", required=True)
    p.add_argument("--output", dest="output_file", required=True)
    p.add_argument("--tok", dest="tokenizer_path", required=True)
    p.add_argument("--max-len", dest="max_len", type=int, default=256)
    p.add_argument("--sample", dest="sample_size", type=int, default=-1)
    p.add_argument("--packed", action="store_true",
                   help="write the first-party ITR1 record format")
    options = p.parse_args(argv)

    from imagetranslate_tpu.data.binarize_captions import write_from_coco
    from imagetranslate_tpu.text.processor import TextProcessor

    tp = TextProcessor(options.tokenizer_path)
    write_from_coco(tp, options.output_file, options.file,
                    max_len=options.max_len, sample_size=options.sample_size,
                    packed=options.packed)
    print("Finished")

if __name__ == "__main__":
    main()
