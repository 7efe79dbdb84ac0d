"""Wiki-image JSON docs -> tagged sentences from docs that HAVE images
(reference scripts/extract_sens_from_img_docs.py). argv: json min max output"""
import json
import sys

def main():
    lo, hi = int(sys.argv[2]), int(sys.argv[3])
    with open(sys.argv[1]) as fp, open(sys.argv[4], "w") as w:
        for v in json.load(fp):
            if not v["images"]:
                continue
            spl = v["content"].strip().split(" ")
            lang, content = spl[0], " ".join(spl[1:])
            sens = [" ".join([lang, s.strip(), "</s>"])
                    for s in content.split("</s>")
                    if s.strip() and lo <= len(s.strip().split(" ")) <= hi]
            if sens:
                w.write("\n".join(sens) + "\n")
    print("Done!")

if __name__ == "__main__":
    main()
