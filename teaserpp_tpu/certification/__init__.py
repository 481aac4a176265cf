"""Optimality certification (Douglas-Rachford-splitting SDP dual solver).

TPU-native replacement for reference certification.{h,cc}.
"""
