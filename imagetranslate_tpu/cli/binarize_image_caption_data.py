"""Wiki-doc JSON ({content, images:[{img_path, caption}]}) -> caption binary
with three caption-selection modes (reference: binarize_image_caption_data.py:
only-captions / relevant-by-word-overlap / all-sentences)."""
import argparse

def main(argv=None):
    p = argparse.ArgumentParser("binarize_image_caption_data")
    p.add_argument("--file", required=True)
    p.add_argument("--output", dest="output_file", required=True)
    p.add_argument("--tok", dest="tokenizer_path", required=True)
    p.add_argument("--max-len", dest="max_len", type=int, default=256)
    p.add_argument("--only-captions", action="store_true")
    p.add_argument("--packed", action="store_true",
                   help="write the first-party ITR1 record format")
    p.add_argument("--all-sentences", action="store_true",
                   help="use every long sentence, not just relevant ones")
    options = p.parse_args(argv)

    from imagetranslate_tpu.data.binarize_captions import write_from_wiki_json
    from imagetranslate_tpu.text.processor import TextProcessor

    tp = TextProcessor(options.tokenizer_path)
    write_from_wiki_json(tp, options.output_file, options.file,
                         max_len=options.max_len,
                         only_captions=options.only_captions,
                         choose_relevant=not options.all_sentences,
                         packed=options.packed)
    print("Finished")

if __name__ == "__main__":
    main()
