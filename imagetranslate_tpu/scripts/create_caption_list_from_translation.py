"""Join a path\tsrc-caption TSV with a translation file (line-aligned) into
path\ttranslated-caption (reference scripts/create_caption_list_from_translation.py).
argv: caption_tsv translations output"""
import sys

def main():
    with open(sys.argv[1]) as r1, open(sys.argv[2]) as r2, \
            open(sys.argv[3], "w") as w:
        for tsv_line, trans in zip(r1, r2):
            spl = tsv_line.strip().split("\t")
            if len(spl) < 1:
                continue
            w.write(spl[0] + "\t" + trans.strip() + "\n")

if __name__ == "__main__":
    main()
