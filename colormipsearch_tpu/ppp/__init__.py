from .raw_reader import read_raw_ppp_matches
