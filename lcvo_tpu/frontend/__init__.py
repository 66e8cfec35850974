"""Feature frontend: detectors, descriptors, matching.

TPU-native equivalents of the reference's OpenCV frontend surface (SURVEY §2.2
N1-N3): SIFT-class blob detection + 128-d descriptors, Shi-Tomasi corners, and
MXU brute-force matching with Lowe's ratio test.
"""
