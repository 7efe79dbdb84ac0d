"""MMID-style dict file ("src\tdst" or "src ||| dst") -> two parallel files
(reference scripts/mmiddict2parallel.py). argv: dict out_src out_dst"""
import sys

def main():
    with open(sys.argv[1]) as r, open(sys.argv[2], "w") as w1, \
            open(sys.argv[3], "w") as w2:
        for line in r:
            line = line.strip()
            if "\t" in line:
                spl = line.split("\t")
            else:
                spl = line.split(" ||| ")
            if len(spl) < 2:
                continue
            w1.write(spl[0].strip() + "\n")
            w2.write(spl[1].strip() + "\n")

if __name__ == "__main__":
    main()
