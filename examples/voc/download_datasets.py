#!/usr/bin/env python
"""Print VOC/SBD download instructions (reference
examples/voc/download_datasets.py; no egress in this environment)."""


def main():
    print("No network egress in this environment. Fetch manually:")
    print("  VOC2012: http://host.robots.ox.ac.uk/pascal/VOC/voc2012/"
          "VOCtrainval_11-May-2012.tar")
    print("  SBD: http://www.eecs.berkeley.edu/Research/Projects/CS/vision/"
          "grouping/semantic_contours/benchmark.tgz")
    print("Place under ~/data/datasets/VOC/")


if __name__ == "__main__":
    main()
