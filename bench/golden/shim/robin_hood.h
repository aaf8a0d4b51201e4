// Build shim for the reference's kmer_searcher: the robin-hood-hashing
// submodule is not vendored in this mount, and its containers are
// behaviorally interchangeable with the std ones for this tool (the
// per-read index SET is order-insensitive downstream — the reference
// reader turns it into a binary feature row). Output bytes can differ
// only in within-record index order, which the format does not specify.
#pragma once
#include <unordered_map>
#include <unordered_set>
namespace robin_hood {
template <class K, class V>
using unordered_map = std::unordered_map<K, V>;
template <class K>
using unordered_set = std::unordered_set<K>;
}  // namespace robin_hood
// The reference TU relies on robin_hood.h transitively including
// <algorithm> (std::all_of) and <cstring>; provide them here.
#include <algorithm>
#include <cstring>
