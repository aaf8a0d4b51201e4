// Drop-in stand-in for the robin-hood-hashing header the reference pins as
// a git submodule (reference .gitmodules:1-3) but which is not vendored in
// this environment. The reference scanner (kmer_searcher.cpp:9, :259, :309)
// uses only unordered_map<u64,u64> and unordered_set<u64> with count/[]/
// insert — the std containers are drop-in API-compatible for that surface,
// and hashing speed does not affect the golden OUTPUT (output.bin), only
// wall time. This lets bench/golden/make_golden.py compile the reference's
// own C++ source unmodified.
#pragma once
#include <algorithm>  // the real robin_hood.h includes this transitively;
                      // kmer_searcher.cpp:112 relies on it for std::all_of
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <unordered_set>

namespace robin_hood {
template <class K, class V>
using unordered_map = std::unordered_map<K, V>;
template <class K>
using unordered_set = std::unordered_set<K>;
}  // namespace robin_hood
