"""Feature front-end: normals, FPFH descriptors, correspondence matching.

TPU-native replacement for reference fpfh.{h,cc} (PCL-backed) and
matcher.{h,cc} (FLANN-backed). Built in later stages of this framework;
see SURVEY.md §7 step 8.
"""
