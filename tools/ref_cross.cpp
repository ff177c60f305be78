// Cross-validation driver against the ACTUAL reference implementation.
//
// This is clann_tpu's own test harness (not reference code): it compiles
// against the read-only vendored PUFFINN headers of the reference tree
// (/root/reference/libpuffinn/include, passed via -I at build time — see
// tests/test_reference_cross.py) and drives the reference's real C++
// engine (libpuffinn/include/puffinn/collection.hpp) so that our codec
// (clann_tpu/native/codec.cpp) and exporter (clann_tpu/io/interop.py) are
// validated against the genuine byte streams and search semantics, not
// just against themselves.
//
// Modes (all binary files little-endian, row-major):
//   build  <family> <data.f32> <n> <d> <L> <seed-ignored> <out.idx>
//       build a reference index (insert + rebuild(L), collection.hpp:219,
//       241) and serialize it (collection.hpp:185) to a raw stream file.
//   search <family> <idx-file> <queries.f32> <nq> <d> <k> <recall> <out.u32>
//       deserialize (collection.hpp:147), run the reference adaptive
//       search (collection.hpp:324 — the CLANN-modified signature with a
//       max_sim floor, passed as 0 == no floor) per query, write nq*k u32
//       ids padded with 0xFFFFFFFF (the c_binder sentinel,
//       libpuffinn-ffi/c_binder.cpp:79).
//   bench  <family> <data.f32> <n> <d> <L> <queries.f32> <nq> <k> <recall> <reps>
//       measured reference baseline on this host: build once, run the
//       query set <reps> times, print one JSON line with build seconds
//       and QPS. This is the reference side of SURVEY.md §6's
//       reproduce-and-compare recipe (benches/distance_benches.rs:93-203
//       runs the same monolithic-PUFFINN loop).
//
// <family> selects the hash family the same way our codec's FAMILY_*
// constants do: "simhash" = Index<CosineSimilarity, SimHash> or
// "fhtcp" = Index<CosineSimilarity> (FHTCrossPolytope is the reference
// cosine default, similarity_measure/cosine.hpp:16).

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <string>
#include <vector>

#include "puffinn.hpp"

namespace {

std::vector<float> read_f32(const char* path, size_t count) {
    std::ifstream in(path, std::ios::binary);
    if (!in) { std::fprintf(stderr, "cannot open %s\n", path); std::exit(2); }
    std::vector<float> out(count);
    in.read(reinterpret_cast<char*>(out.data()), count * sizeof(float));
    if (!in) { std::fprintf(stderr, "short read from %s\n", path); std::exit(2); }
    return out;
}

std::vector<std::vector<uint32_t>> read_sets(const char* tok_path,
                                             const char* off_path, size_t n);

// Builds with the given hash-source args — the knob that exercises the
// codec's pool/tensor stream formats (deserialize.hpp:10-23). The family
// string may carry a ":pool" / ":tensor" suffix (see main); pool size is
// fixed at 3072 bits, a typical setting (pool.hpp:192-198 discussion).
template <typename THash>
int run_build(int argc, char** argv,
              const puffinn::HashSourceArgs<THash>& hash_args) {
    const char* data_path = argv[3];
    size_t n = std::stoull(argv[4]);
    unsigned d = std::stoul(argv[5]);
    unsigned L = std::stoul(argv[6]);
    const char* out_path = argv[8];
    auto data = read_f32(data_path, n * d);

    puffinn::Index<puffinn::CosineSimilarity, THash> index(d, hash_args);
    std::vector<float> row(d);
    for (size_t i = 0; i < n; i++) {
        std::memcpy(row.data(), data.data() + i * d, d * sizeof(float));
        index.insert(row);
    }
    uint64_t mem = index.rebuild(L);
    std::ofstream out(out_path, std::ios::binary);
    index.serialize(out);
    std::printf("{\"mode\":\"build\",\"n\":%zu,\"d\":%u,\"L\":%u,\"memory\":%llu}\n",
                n, d, L, (unsigned long long)mem);
    return 0;
}

// build_jaccard <tokens.u32> <offsets.u32> <n> <universe> <L> <out.idx>
// Reference Jaccard index build + serialize: the MinHash/SetFormat stream
// the codec must round-trip (minhash.hpp:97-220, format/set.hpp:70-99).
int run_build_jaccard(int argc, char** argv) {
    if (argc < 8) { std::fprintf(stderr, "build_jaccard: bad args\n"); return 2; }
    size_t n = std::stoull(argv[4]);
    unsigned universe = std::stoul(argv[5]);
    unsigned L = std::stoul(argv[6]);
    const char* out_path = argv[7];
    auto sets = read_sets(argv[2], argv[3], n);
    puffinn::Index<puffinn::JaccardSimilarity> index(universe);
    for (auto& s : sets) index.insert(s);
    uint64_t mem = index.rebuild(L);
    std::ofstream out(out_path, std::ios::binary);
    index.serialize(out);
    std::printf(
        "{\"mode\":\"build_jaccard\",\"n\":%zu,\"universe\":%u,\"L\":%u,"
        "\"memory\":%llu}\n",
        n, universe, L, (unsigned long long)mem);
    return 0;
}

// search_jaccard <idx> <q_tokens.u32> <q_offsets.u32> <nq> <k> <recall> <out.u32>
// Loads a (possibly clann_tpu-exported) jaccard stream and runs the
// reference adaptive search — the reference-loads-our-export check.
int run_search_jaccard(int argc, char** argv) {
    if (argc < 9) { std::fprintf(stderr, "search_jaccard: bad args\n"); return 2; }
    const char* idx_path = argv[2];
    size_t nq = std::stoull(argv[5]);
    unsigned k = std::stoul(argv[6]);
    float recall = std::stof(argv[7]);
    const char* out_path = argv[8];
    std::ifstream in(idx_path, std::ios::binary);
    if (!in) { std::fprintf(stderr, "cannot open %s\n", idx_path); return 2; }
    puffinn::Index<puffinn::JaccardSimilarity> index(in);
    auto queries = read_sets(argv[3], argv[4], nq);
    std::vector<uint32_t> results(nq * k, 0xFFFFFFFFu);
    for (size_t i = 0; i < nq; i++) {
        auto ids = index.search(queries[i], k, recall, 0.0f);
        for (size_t j = 0; j < ids.size() && j < k; j++) {
            results[i * k + j] = ids[j];
        }
    }
    std::ofstream out(out_path, std::ios::binary);
    out.write(reinterpret_cast<char*>(results.data()),
              results.size() * sizeof(uint32_t));
    std::printf("{\"mode\":\"search_jaccard\",\"nq\":%zu,\"k\":%u}\n", nq, k);
    return 0;
}

template <typename THash>
int run_search(int argc, char** argv) {
    const char* idx_path = argv[3];
    const char* q_path = argv[4];
    size_t nq = std::stoull(argv[5]);
    unsigned d = std::stoul(argv[6]);
    unsigned k = std::stoul(argv[7]);
    float recall = std::stof(argv[8]);
    const char* out_path = argv[9];

    std::ifstream in(idx_path, std::ios::binary);
    if (!in) { std::fprintf(stderr, "cannot open %s\n", idx_path); return 2; }
    puffinn::Index<puffinn::CosineSimilarity, THash> index(in);
    auto queries = read_f32(q_path, nq * d);

    std::vector<uint32_t> results(nq * k, 0xFFFFFFFFu);
    std::vector<float> q(d);
    for (size_t i = 0; i < nq; i++) {
        std::memcpy(q.data(), queries.data() + i * d, d * sizeof(float));
        auto ids = index.search(q, k, recall, /*max_sim=*/0.0f);
        for (size_t j = 0; j < ids.size() && j < k; j++) {
            results[i * k + j] = ids[j];
        }
    }
    std::ofstream out(out_path, std::ios::binary);
    out.write(reinterpret_cast<char*>(results.data()),
              results.size() * sizeof(uint32_t));
    std::printf("{\"mode\":\"search\",\"nq\":%zu,\"k\":%u}\n", nq, k);
    return 0;
}

template <typename THash>
int run_bench(int argc, char** argv) {
    const char* data_path = argv[3];
    size_t n = std::stoull(argv[4]);
    unsigned d = std::stoul(argv[5]);
    unsigned L = std::stoul(argv[6]);
    const char* q_path = argv[7];
    size_t nq = std::stoull(argv[8]);
    unsigned k = std::stoul(argv[9]);
    float recall = std::stof(argv[10]);
    int reps = std::stoi(argv[11]);
    const char* ids_out = argc > 12 ? argv[12] : nullptr;

    auto data = read_f32(data_path, n * d);
    auto queries = read_f32(q_path, nq * d);

    auto t0 = std::chrono::steady_clock::now();
    puffinn::Index<puffinn::CosineSimilarity, THash> index(d);
    std::vector<float> row(d);
    for (size_t i = 0; i < n; i++) {
        std::memcpy(row.data(), data.data() + i * d, d * sizeof(float));
        index.insert(row);
    }
    uint64_t mem = index.rebuild(L);
    auto t1 = std::chrono::steady_clock::now();
    double build_s = std::chrono::duration<double>(t1 - t0).count();

    // warm-up pass, then timed passes (the reference query loop is
    // single-threaded by design, collection.hpp:106-112)
    std::vector<float> q(d);
    size_t found = 0;
    std::vector<uint32_t> ids_buf(nq * k, 0xFFFFFFFFu);
    for (size_t i = 0; i < nq; i++) {
        std::memcpy(q.data(), queries.data() + i * d, d * sizeof(float));
        auto ids = index.search(q, k, recall, 0.0f);
        found += ids.size();
        for (size_t j = 0; j < ids.size() && j < k; j++) {
            ids_buf[i * k + j] = ids[j];
        }
    }
    if (ids_out) {
        std::ofstream out(ids_out, std::ios::binary);
        out.write(reinterpret_cast<char*>(ids_buf.data()),
                  ids_buf.size() * sizeof(uint32_t));
    }
    auto t2 = std::chrono::steady_clock::now();
    for (int r = 0; r < reps; r++) {
        for (size_t i = 0; i < nq; i++) {
            std::memcpy(q.data(), queries.data() + i * d, d * sizeof(float));
            found += index.search(q, k, recall, 0.0f).size();
        }
    }
    auto t3 = std::chrono::steady_clock::now();
    double search_s = std::chrono::duration<double>(t3 - t2).count();
    double qps = (double)(nq * reps) / search_s;
    // memory is rebuild()'s own accounting of the index footprint
    // (collection.hpp rebuild return; BASELINE.json's equal-index-memory
    // condition is checked against this number)
    std::printf(
        "{\"mode\":\"bench\",\"n\":%zu,\"d\":%u,\"L\":%u,\"nq\":%zu,\"k\":%u,"
        "\"recall_target\":%.3f,\"build_s\":%.3f,\"qps\":%.2f,"
        "\"warm_qps\":%.2f,\"found\":%zu,\"memory\":%llu}\n",
        n, d, L, nq, k, recall, build_s, qps,
        (double)nq / std::chrono::duration<double>(t2 - t1).count(), found,
        (unsigned long long)mem);
    return 0;
}

std::vector<std::vector<uint32_t>> read_sets(const char* tok_path,
                                             const char* off_path, size_t n) {
    std::ifstream off_in(off_path, std::ios::binary);
    if (!off_in) { std::fprintf(stderr, "cannot open %s\n", off_path); std::exit(2); }
    std::vector<uint32_t> offsets(n + 1);
    off_in.read(reinterpret_cast<char*>(offsets.data()),
                (n + 1) * sizeof(uint32_t));
    if (!off_in) { std::fprintf(stderr, "short read %s\n", off_path); std::exit(2); }
    std::ifstream tok_in(tok_path, std::ios::binary);
    if (!tok_in) { std::fprintf(stderr, "cannot open %s\n", tok_path); std::exit(2); }
    std::vector<uint32_t> tokens(offsets[n]);
    tok_in.read(reinterpret_cast<char*>(tokens.data()),
                offsets[n] * sizeof(uint32_t));
    if (!tok_in) { std::fprintf(stderr, "short read %s\n", tok_path); std::exit(2); }
    std::vector<std::vector<uint32_t>> sets(n);
    for (size_t i = 0; i < n; i++) {
        sets[i].assign(tokens.begin() + offsets[i], tokens.begin() + offsets[i + 1]);
    }
    return sets;
}

// bench_jaccard <tokens.u32> <offsets.u32> <n> <universe> <L>
//               <q_tokens.u32> <q_offsets.u32> <nq> <k> <recall> <reps> [ids.u32]
// Same protocol as run_bench but over the reference's Jaccard
// instantiation (Index<JaccardSimilarity> = MinHash tables + MinHash1Bit
// sketches, similarity_measure/jaccard.hpp:13-46; the c_binder exposes
// this family by the "jaccard" dispatch string, c_binder.cpp:39-50).
int run_bench_jaccard(int argc, char** argv) {
    if (argc < 13) { std::fprintf(stderr, "bench_jaccard: bad args\n"); return 2; }
    size_t n = std::stoull(argv[4]);
    unsigned universe = std::stoul(argv[5]);
    unsigned L = std::stoul(argv[6]);
    size_t nq = std::stoull(argv[9]);
    unsigned k = std::stoul(argv[10]);
    float recall = std::stof(argv[11]);
    int reps = std::stoi(argv[12]);
    const char* ids_out = argc > 13 ? argv[13] : nullptr;

    auto sets = read_sets(argv[2], argv[3], n);
    auto queries = read_sets(argv[7], argv[8], nq);

    auto t0 = std::chrono::steady_clock::now();
    puffinn::Index<puffinn::JaccardSimilarity> index(universe);
    for (auto& s : sets) index.insert(s);
    index.rebuild(L);
    auto t1 = std::chrono::steady_clock::now();
    double build_s = std::chrono::duration<double>(t1 - t0).count();

    size_t found = 0;
    std::vector<uint32_t> ids_buf(nq * k, 0xFFFFFFFFu);
    for (size_t i = 0; i < nq; i++) {
        auto ids = index.search(queries[i], k, recall, 0.0f);
        found += ids.size();
        for (size_t j = 0; j < ids.size() && j < k; j++) {
            ids_buf[i * k + j] = ids[j];
        }
    }
    if (ids_out) {
        std::ofstream out(ids_out, std::ios::binary);
        out.write(reinterpret_cast<char*>(ids_buf.data()),
                  ids_buf.size() * sizeof(uint32_t));
    }
    auto t2 = std::chrono::steady_clock::now();
    for (int r = 0; r < reps; r++) {
        for (size_t i = 0; i < nq; i++) {
            found += index.search(queries[i], k, recall, 0.0f).size();
        }
    }
    auto t3 = std::chrono::steady_clock::now();
    double search_s = std::chrono::duration<double>(t3 - t2).count();
    std::printf(
        "{\"mode\":\"bench_jaccard\",\"n\":%zu,\"universe\":%u,\"L\":%u,"
        "\"nq\":%zu,\"k\":%u,\"recall_target\":%.3f,\"build_s\":%.3f,"
        "\"qps\":%.2f,\"warm_qps\":%.2f,\"found\":%zu}\n",
        n, universe, L, nq, k, recall, build_s,
        (double)(nq * reps) / search_s,
        (double)nq / std::chrono::duration<double>(t2 - t1).count(), found);
    return 0;
}

template <typename THash>
int dispatch(const std::string& mode, const std::string& source,
             int argc, char** argv) {
    if (mode == "build") {
        if (source == "pool") {
            return run_build<THash>(argc, argv,
                                    puffinn::HashPoolArgs<THash>(3072));
        }
        if (source == "tensor") {
            return run_build<THash>(argc, argv,
                                    puffinn::TensoredHashArgs<THash>());
        }
        return run_build<THash>(argc, argv,
                                puffinn::IndependentHashArgs<THash>());
    }
    if (mode == "search") return run_search<THash>(argc, argv);
    if (mode == "bench") return run_bench<THash>(argc, argv);
    std::fprintf(stderr, "unknown mode %s\n", mode.c_str());
    return 2;
}

}  // namespace

int main(int argc, char** argv) {
    if (argc < 3) {
        std::fprintf(stderr,
                     "usage: ref_cross <mode> <family=simhash|fhtcp> ...\n");
        return 2;
    }
    std::string mode = argv[1];
    if (mode == "bench_jaccard") return run_bench_jaccard(argc, argv);
    if (mode == "build_jaccard") return run_build_jaccard(argc, argv);
    if (mode == "search_jaccard") return run_search_jaccard(argc, argv);
    // family may carry a ":pool" / ":tensor" source suffix for build
    std::string family = argv[2];
    std::string source = "independent";
    auto colon = family.find(':');
    if (colon != std::string::npos) {
        source = family.substr(colon + 1);
        family = family.substr(0, colon);
    }
    if (family == "simhash") {
        return dispatch<puffinn::SimHash>(mode, source, argc, argv);
    }
    if (family == "fhtcp") {
        return dispatch<puffinn::FHTCrossPolytopeHash>(mode, source, argc,
                                                       argv);
    }
    if (family == "cp") {
        return dispatch<puffinn::CrossPolytopeHash>(mode, source, argc, argv);
    }
    std::fprintf(stderr, "unknown family %s\n", family.c_str());
    return 2;
}
