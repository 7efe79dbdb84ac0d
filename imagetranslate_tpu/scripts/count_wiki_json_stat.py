"""Doc/image/caption counts over wiki-image JSON (reference
scripts/count_wiki_json_stat.py). argv: json"""
import json
import sys

def main():
    with open(sys.argv[1]) as fp:
        docs = json.load(fp)
    images = sum(len(v["images"]) for v in docs)
    sens = sum(len([s for s in v["content"].split("</s>") if s.strip()])
               for v in docs)
    print(len(docs), "docs,", images, "images,", sens, "sens")

if __name__ == "__main__":
    main()
