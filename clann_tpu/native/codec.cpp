// Native reference-format index codec (C ABI, loaded via ctypes).
//
// TPU-native equivalent of the reference's native FFI layer
// (reference: libpuffinn-ffi/c_binder.{h,cpp} — the C ABI bridge between
// index bytes and the engine). Where the reference shim wraps a live C++
// PUFFINN object, this codec translates between the reference's versioned
// binary index stream (SURVEY.md §3.3) and flat arrays the JAX engine
// consumes, enabling interop: read an index produced by the Rust/C++
// reference, and write one it can load.
//
// Stream layout implemented (CosineSimilarity, independent hash source —
// the reference defaults; little-endian, size_t = 8 bytes):
//   Index            := Dataset Filterer HashArgs has_source:u8 [Source]
//                       num_maps:u64 use_chunks:u8 PrefixMap* last_rebuild:u32
//                       (collection.hpp:147-209)
//   Dataset          := dims:u32 storage_len:u32 n:u32 data:i16[n*storage_len]
//                       (dataset.hpp:68-86, format/unit_vector.hpp Q15)
//   Filterer         := HashArgs Source len:u64 sketches:u64[len]
//                       (filterer.hpp:52-69)
//   HashArgs         := type:u32(0=independent) FamilyArgs
//                       (hash_source/deserialize.hpp:10-23,
//                        independent.hpp:135-139)
//   FamilyArgs(SimHash)  := (empty)              (simhash.hpp:49-59)
//   FamilyArgs(FHT-CP)   := num_rotations:i32 est_reps:u32 est_eps:f32
//                       (crosspolytope.hpp:225-240)
//   Source           := Family funcs:u64 Function* num_hashers:u32
//                       fph:u32 bits_per_function:u8 next_function:u32
//                       bits_to_cut:u32          (independent.hpp:40-68)
//   Family(SimHash)  := dims:u32 storage_len:u32 (DatasetDescription,
//                       generic.hpp:21-24)
//   Family(FHT-CP)   := dims:u32 storage_len:u32 FamilyArgs Estimates
//   Estimates        := d1:u64 { d2:u64 probs:f32[d2] }* eps:f32
//                       (crosspolytope.hpp:91-115)
//   Function(SimHash):= dims:u32 plane:i16[dims]  (simhash.hpp:25-38)
//   Function(FHT-CP) := dims:i32 log_dims:i32 rots:u32
//                       signs:i8[rots<<log_dims] (crosspolytope.hpp:165-184)
//   PrefixMap        := len:u64 indices:u32[len] hashes:u32[len]
//                       rebuilding:u64(=0) hash_length:u32
//                       prefix_index:u32[8193]   (prefixmap.hpp:99-153)
//
// Build: make -C clann_tpu/native   ->  libclann_codec.so

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

constexpr uint32_t kMaxHashbits = 24;     // typedefs.hpp:13
constexpr uint32_t kPrefixIndexLen = (1u << 13) + 1;  // prefixmap.hpp:70,86

enum FamilyKind : int32_t {
  kFamilySimHash = 0,
  kFamilyFhtCrossPolytope = 1,
};

struct Reader {
  const uint8_t* p;
  const uint8_t* end;
  bool ok = true;

  bool take(void* out, size_t len) {
    if (!ok || p + len > end) { ok = false; return false; }
    std::memcpy(out, p, len);
    p += len;
    return true;
  }
  template <typename T> T get() { T v{}; take(&v, sizeof(T)); return v; }
  bool skip(size_t len) {
    if (!ok || p + len > end) { ok = false; return false; }
    p += len;
    return true;
  }
};

struct Writer {
  std::vector<uint8_t> buf;
  void put(const void* src, size_t len) {
    const uint8_t* s = static_cast<const uint8_t*>(src);
    buf.insert(buf.end(), s, s + len);
  }
  template <typename T> void set(T v) { put(&v, sizeof(T)); }
};

struct SimHashFn {
  std::vector<int16_t> plane;  // storage_len entries
};

struct FhtFn {
  int32_t dims = 0;
  int32_t log_dims = 0;
  uint32_t rotations = 0;
  std::vector<int8_t> signs;
};

struct SourceInfo {
  uint32_t num_hashers = 0;
  uint32_t functions_per_hasher = 0;
  uint8_t bits_per_function = 0;
  uint32_t next_function = 0;
  uint32_t bits_to_cut = 0;
};

struct ParsedIndex {
  // dataset
  uint32_t dims = 0;
  uint32_t storage_len = 0;
  uint32_t n = 0;
  std::vector<int16_t> data;  // n * storage_len Q15
  // sketches
  std::vector<uint64_t> sketches;  // n * NUM_SKETCHES
  SourceInfo sketch_source;
  std::vector<SimHashFn> sketch_fns;
  // table hash machinery
  int32_t family = kFamilySimHash;
  int32_t num_rotations = 3;
  uint32_t est_reps = 0;
  float est_eps = 0.f;
  std::vector<float> estimates;      // flattened rows
  std::vector<uint64_t> est_row_len; // d2 per row
  SourceInfo hash_source;
  std::vector<SimHashFn> hash_simhash_fns;
  std::vector<FhtFn> hash_fht_fns;
  bool has_hash_source = false;
  // tables
  std::vector<std::vector<uint32_t>> map_indices;
  std::vector<std::vector<uint32_t>> map_hashes;
  std::vector<uint32_t> map_hash_length;
  uint32_t last_rebuild = 0;
  // chunked serialization (collection.hpp:178-209, use_chunks=true): the
  // main stream carries num_maps but no inline PrefixMaps; each map arrives
  // as its own chunk stream (one PrefixMap::serialize each,
  // collection.hpp:171-176)
  bool chunked = false;
  uint64_t expected_maps = 0;
  std::string error;
};

bool read_dataset(Reader& r, ParsedIndex& ix) {
  ix.dims = r.get<uint32_t>();         // UnitVectorFormat::Args
  ix.storage_len = r.get<uint32_t>();
  ix.n = r.get<uint32_t>();
  ix.data.resize(size_t(ix.n) * ix.storage_len);
  if (!ix.data.empty()) r.take(ix.data.data(), ix.data.size() * 2);
  return r.ok;
}

bool read_simhash_family(Reader& r) {
  r.get<uint32_t>();  // DatasetDescription.args (dims)
  r.get<uint32_t>();  // DatasetDescription.storage_len
  return r.ok;
}

bool read_source_simhash(Reader& r, SourceInfo& info,
                         std::vector<SimHashFn>& fns) {
  if (!read_simhash_family(r)) return false;
  uint64_t len = r.get<uint64_t>();
  fns.clear();
  for (uint64_t i = 0; i < len && r.ok; i++) {
    SimHashFn f;
    uint32_t d = r.get<uint32_t>();
    f.plane.resize(d);
    if (d) r.take(f.plane.data(), size_t(d) * 2);
    fns.push_back(std::move(f));
  }
  info.num_hashers = r.get<uint32_t>();
  info.functions_per_hasher = r.get<uint32_t>();
  info.bits_per_function = r.get<uint8_t>();
  info.next_function = r.get<uint32_t>();
  info.bits_to_cut = r.get<uint32_t>();
  return r.ok;
}

bool read_fht_family(Reader& r, ParsedIndex& ix) {
  r.get<uint32_t>();  // desc args
  r.get<uint32_t>();  // desc storage_len
  ix.num_rotations = r.get<int32_t>();
  ix.est_reps = r.get<uint32_t>();
  ix.est_eps = r.get<float>();
  uint64_t d1 = r.get<uint64_t>();
  ix.estimates.clear();
  ix.est_row_len.clear();
  for (uint64_t i = 0; i < d1 && r.ok; i++) {
    uint64_t d2 = r.get<uint64_t>();
    ix.est_row_len.push_back(d2);
    size_t off = ix.estimates.size();
    ix.estimates.resize(off + d2);
    if (d2) r.take(ix.estimates.data() + off, d2 * 4);
  }
  r.get<float>();  // eps (repeated inside estimates struct)
  return r.ok;
}

bool read_source_fht(Reader& r, ParsedIndex& ix) {
  if (!read_fht_family(r, ix)) return false;
  uint64_t len = r.get<uint64_t>();
  ix.hash_fht_fns.clear();
  for (uint64_t i = 0; i < len && r.ok; i++) {
    FhtFn f;
    f.dims = r.get<int32_t>();
    f.log_dims = r.get<int32_t>();
    f.rotations = r.get<uint32_t>();
    size_t signs_len = size_t(f.rotations) << f.log_dims;
    f.signs.resize(signs_len);
    if (signs_len) r.take(f.signs.data(), signs_len);
    ix.hash_fht_fns.push_back(std::move(f));
  }
  ix.hash_source.num_hashers = r.get<uint32_t>();
  ix.hash_source.functions_per_hasher = r.get<uint32_t>();
  ix.hash_source.bits_per_function = r.get<uint8_t>();
  ix.hash_source.next_function = r.get<uint32_t>();
  ix.hash_source.bits_to_cut = r.get<uint32_t>();
  return r.ok;
}

// Parses "HashArgs" for a SimHash family (sketches): tag + empty args.
bool read_sketch_args(Reader& r, ParsedIndex& ix) {
  uint32_t type = r.get<uint32_t>();
  if (type != 0) { ix.error = "unsupported sketch source type"; return false; }
  return r.ok;  // SimHashArgs serialize as nothing
}

bool read_filterer(Reader& r, ParsedIndex& ix) {
  if (!read_sketch_args(r, ix)) return false;
  if (!read_source_simhash(r, ix.sketch_source, ix.sketch_fns)) return false;
  uint64_t len = r.get<uint64_t>();
  ix.sketches.resize(len);
  if (len) r.take(ix.sketches.data(), len * 8);
  return r.ok;
}

bool read_prefix_map(Reader& r, ParsedIndex& ix) {
  uint64_t len = r.get<uint64_t>();
  std::vector<uint32_t> idx(len), hsh(len);
  if (len) {
    r.take(idx.data(), len * 4);
    r.take(hsh.data(), len * 4);
  }
  uint64_t rebuilding = r.get<uint64_t>();
  r.skip(rebuilding * 8);  // HashedVecIdx = {u32 hash, u32 idx}
  uint32_t hash_length = r.get<uint32_t>();
  r.skip(size_t(kPrefixIndexLen) * 4);
  if (!r.ok) return false;
  // Strip the SEGMENT_SIZE sentinel padding (hash == 0xffffffff) the
  // reference adds on both ends (prefixmap.hpp:209-226); real 24-bit
  // hashes can never equal the sentinel.
  std::vector<uint32_t> cidx, chsh;
  cidx.reserve(idx.size());
  chsh.reserve(hsh.size());
  for (size_t i = 0; i < hsh.size(); i++) {
    if (hsh[i] != 0xffffffffu) {
      cidx.push_back(idx[i]);
      chsh.push_back(hsh[i]);
    }
  }
  ix.map_indices.push_back(std::move(cidx));
  ix.map_hashes.push_back(std::move(chsh));
  ix.map_hash_length.push_back(hash_length);
  return true;
}

// Serializes one PrefixMap: sentinel padding on both ends plus a correct
// 13-bit prefix directory so the reference can query the map without a
// rebuild (prefixmap.hpp:99-153,209-240).
void write_map(Writer* out, uint64_t len, const uint32_t* indices,
               const uint32_t* hashes) {
  constexpr int kSegmentSize = 12;  // prefixmap.hpp:60
  uint64_t padded = len + 2 * kSegmentSize;
  out->set<uint64_t>(padded);
  std::vector<uint32_t> idx(padded, 0), hsh(padded, 0xffffffffu);
  if (len) {
    std::memcpy(idx.data() + kSegmentSize, indices, len * 4);
    std::memcpy(hsh.data() + kSegmentSize, hashes, len * 4);
  }
  out->put(idx.data(), padded * 4);
  out->put(hsh.data(), padded * 4);
  out->set<uint64_t>(0);  // rebuilding_len
  out->set<uint32_t>(kMaxHashbits);  // hash_length
  std::vector<uint32_t> dir(kPrefixIndexLen, 0);
  uint64_t cursor = 0;
  for (uint32_t prefix = 0; prefix < (kPrefixIndexLen - 1); prefix++) {
    while (cursor < len &&
           (hashes[cursor] >> (kMaxHashbits - 13)) < prefix) {
      cursor++;
    }
    dir[prefix] = kSegmentSize + static_cast<uint32_t>(cursor);
  }
  dir[kPrefixIndexLen - 1] = kSegmentSize + static_cast<uint32_t>(len);
  out->put(dir.data(), dir.size() * 4);
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------- parse --

void* clann_ref_parse(const uint8_t* buf, uint64_t len, int32_t family) {
  auto* ix = new ParsedIndex();
  ix->family = family;
  Reader r{buf, buf + len};
  do {
    if (!read_dataset(r, *ix)) { ix->error = "dataset"; break; }
    if (!read_filterer(r, *ix)) {
      if (ix->error.empty()) ix->error = "filterer";
      break;
    }
    uint32_t hash_type = r.get<uint32_t>();
    if (hash_type != 0) { ix->error = "unsupported hash source type"; break; }
    if (family == kFamilyFhtCrossPolytope) {
      // FHTCrossPolytopeArgs in HashArgs position
      ix->num_rotations = r.get<int32_t>();
      ix->est_reps = r.get<uint32_t>();
      ix->est_eps = r.get<float>();
    }
    uint8_t has_source = r.get<uint8_t>();
    ix->has_hash_source = has_source != 0;
    if (ix->has_hash_source) {
      bool ok = family == kFamilyFhtCrossPolytope
                    ? read_source_fht(r, *ix)
                    : read_source_simhash(r, ix->hash_source,
                                          ix->hash_simhash_fns);
      if (!ok) { ix->error = "hash source"; break; }
    }
    uint64_t num_maps = r.get<uint64_t>();
    uint8_t use_chunks = r.get<uint8_t>();
    ix->chunked = use_chunks != 0;
    ix->expected_maps = num_maps;
    if (!use_chunks) {
      for (uint64_t i = 0; i < num_maps; i++) {
        if (!read_prefix_map(r, *ix)) { ix->error = "prefix map"; break; }
      }
    }
    if (!ix->error.empty()) break;
    ix->last_rebuild = r.get<uint32_t>();
    if (!r.ok) ix->error = "truncated stream";
  } while (false);
  return ix;
}

// Parses one PrefixMap chunk stream into a chunked-parsed index (the
// counterpart of Index::deserialize_chunk, collection.hpp:171-176).
// Returns 1 on success, 0 on failure (error retrievable via clann_ref_error).
int32_t clann_ref_parse_chunk(void* h, const uint8_t* buf, uint64_t len) {
  auto* ix = static_cast<ParsedIndex*>(h);
  Reader r{buf, buf + len};
  if (!read_prefix_map(r, *ix)) {
    ix->error = "prefix map chunk";
    return 0;
  }
  return 1;
}

uint32_t clann_ref_is_chunked(void* h) {
  return static_cast<ParsedIndex*>(h)->chunked ? 1 : 0;
}
uint64_t clann_ref_expected_maps(void* h) {
  return static_cast<ParsedIndex*>(h)->expected_maps;
}

void clann_ref_free(void* h) { delete static_cast<ParsedIndex*>(h); }

const char* clann_ref_error(void* h) {
  auto* ix = static_cast<ParsedIndex*>(h);
  return ix->error.empty() ? nullptr : ix->error.c_str();
}

uint32_t clann_ref_dims(void* h) { return static_cast<ParsedIndex*>(h)->dims; }
uint32_t clann_ref_storage_len(void* h) {
  return static_cast<ParsedIndex*>(h)->storage_len;
}
uint32_t clann_ref_num_points(void* h) {
  return static_cast<ParsedIndex*>(h)->n;
}
uint32_t clann_ref_num_maps(void* h) {
  return static_cast<uint32_t>(static_cast<ParsedIndex*>(h)->map_indices.size());
}
uint32_t clann_ref_last_rebuild(void* h) {
  return static_cast<ParsedIndex*>(h)->last_rebuild;
}
const int16_t* clann_ref_data(void* h) {
  return static_cast<ParsedIndex*>(h)->data.data();
}
uint64_t clann_ref_num_sketches(void* h) {
  return static_cast<ParsedIndex*>(h)->sketches.size();
}
const uint64_t* clann_ref_sketches(void* h) {
  return static_cast<ParsedIndex*>(h)->sketches.data();
}
uint64_t clann_ref_map_len(void* h, uint32_t i) {
  return static_cast<ParsedIndex*>(h)->map_indices[i].size();
}
const uint32_t* clann_ref_map_indices(void* h, uint32_t i) {
  return static_cast<ParsedIndex*>(h)->map_indices[i].data();
}
const uint32_t* clann_ref_map_hashes(void* h, uint32_t i) {
  return static_cast<ParsedIndex*>(h)->map_hashes[i].data();
}
uint32_t clann_ref_map_hash_length(void* h, uint32_t i) {
  return static_cast<ParsedIndex*>(h)->map_hash_length[i];
}
uint32_t clann_ref_num_sketch_fns(void* h) {
  return static_cast<uint32_t>(static_cast<ParsedIndex*>(h)->sketch_fns.size());
}
const int16_t* clann_ref_sketch_fn_plane(void* h, uint32_t i, uint32_t* len) {
  auto& f = static_cast<ParsedIndex*>(h)->sketch_fns[i];
  *len = static_cast<uint32_t>(f.plane.size());
  return f.plane.data();
}
uint32_t clann_ref_num_hash_fns(void* h) {
  auto* ix = static_cast<ParsedIndex*>(h);
  return static_cast<uint32_t>(ix->family == kFamilyFhtCrossPolytope
                                   ? ix->hash_fht_fns.size()
                                   : ix->hash_simhash_fns.size());
}
const int16_t* clann_ref_hash_fn_plane(void* h, uint32_t i, uint32_t* len) {
  auto& f = static_cast<ParsedIndex*>(h)->hash_simhash_fns[i];
  *len = static_cast<uint32_t>(f.plane.size());
  return f.plane.data();
}
const int8_t* clann_ref_hash_fn_signs(void* h, uint32_t i, int32_t* log_dims,
                                      uint32_t* rotations) {
  auto& f = static_cast<ParsedIndex*>(h)->hash_fht_fns[i];
  *log_dims = f.log_dims;
  *rotations = f.rotations;
  return f.signs.data();
}
// Parsed FHT-CP Monte-Carlo collision estimates (crosspolytope.hpp:10-119),
// exposed so a faithful re-export can pass the reference's own table back
// through instead of re-tabulating (which could never be byte-identical —
// the reference samples them from its clock-seeded RNG). Returns 1 and the
// (rows, cols) shape when present and rectangular; 0 otherwise.
uint32_t clann_ref_est_info(void* h, uint32_t* reps, float* eps,
                            uint32_t* rows, uint32_t* cols) {
  auto* ix = static_cast<ParsedIndex*>(h);
  if (ix->est_row_len.empty()) return 0;
  uint64_t c = ix->est_row_len[0];
  for (uint64_t len : ix->est_row_len) {
    if (len != c) return 0;
  }
  *reps = ix->est_reps;
  *eps = ix->est_eps;
  *rows = static_cast<uint32_t>(ix->est_row_len.size());
  *cols = static_cast<uint32_t>(c);
  return 1;
}
const float* clann_ref_est_data(void* h) {
  return static_cast<ParsedIndex*>(h)->estimates.data();
}
int32_t clann_ref_num_rotations(void* h) {
  return static_cast<ParsedIndex*>(h)->num_rotations;
}
void clann_ref_source_info(void* h, uint32_t* num_hashers, uint32_t* fph,
                           uint32_t* bits_per_fn, uint32_t* bits_to_cut) {
  auto& s = static_cast<ParsedIndex*>(h)->hash_source;
  *num_hashers = s.num_hashers;
  *fph = s.functions_per_hasher;
  *bits_per_fn = s.bits_per_function;
  *bits_to_cut = s.bits_to_cut;
}

// ---------------------------------------------------------------- write --

// Writes a reference-loadable stream for a SimHash-family index with an
// independent source. All arrays are caller-provided flat buffers.
// Returns a handle whose buffer is fetched with clann_ref_out_{data,len}.
void* clann_ref_write_simhash(
    uint32_t dims, uint32_t storage_len, uint32_t n, const int16_t* data,
    // sketch machinery: planes (num_sketch_fns x storage_len), sketches
    uint32_t num_sketch_fns, const int16_t* sketch_planes,
    uint64_t num_sketch_words, const uint64_t* sketches,
    uint32_t sketch_hashers, uint32_t sketch_fph, uint32_t sketch_cut,
    // table machinery
    uint32_t num_hash_fns, const int16_t* hash_planes, uint32_t num_hashers,
    uint32_t fph, uint32_t bits_to_cut,
    // tables: concatenated per-map arrays with per-map length
    uint32_t num_maps, const uint64_t* map_lens, const uint32_t* map_indices,
    const uint32_t* map_hashes, uint32_t last_rebuild, uint32_t use_chunks) {
  auto* out = new Writer();
  // Dataset
  out->set<uint32_t>(dims);
  out->set<uint32_t>(storage_len);
  out->set<uint32_t>(n);
  out->put(data, size_t(n) * storage_len * 2);
  // Filterer: args tag + (empty SimHashArgs) + source + sketches
  out->set<uint32_t>(0);  // HashSourceType::Independent
  // source: family desc
  out->set<uint32_t>(dims);
  out->set<uint32_t>(storage_len);
  out->set<uint64_t>(num_sketch_fns);
  for (uint32_t i = 0; i < num_sketch_fns; i++) {
    out->set<uint32_t>(storage_len);
    out->put(sketch_planes + size_t(i) * storage_len, size_t(storage_len) * 2);
  }
  out->set<uint32_t>(sketch_hashers);
  out->set<uint32_t>(sketch_fph);
  out->set<uint8_t>(1);  // SimHash bits_per_function
  // next_function: dead state in the reference (initialized 0 at
  // independent.hpp:15, serialized at :66, never incremented anywhere) —
  // genuine reference streams always carry 0, so 0 keeps re-emission
  // byte-identical (validated against real C++ bytes in
  // tests/test_reference_cross.py)
  out->set<uint32_t>(0);
  out->set<uint32_t>(sketch_cut);
  out->set<uint64_t>(num_sketch_words);
  out->put(sketches, num_sketch_words * 8);
  // HashArgs: independent + SimHashArgs (empty)
  out->set<uint32_t>(0);
  // has_hash_source
  out->set<uint8_t>(1);
  // source
  out->set<uint32_t>(dims);
  out->set<uint32_t>(storage_len);
  out->set<uint64_t>(num_hash_fns);
  for (uint32_t i = 0; i < num_hash_fns; i++) {
    out->set<uint32_t>(storage_len);
    out->put(hash_planes + size_t(i) * storage_len, size_t(storage_len) * 2);
  }
  out->set<uint32_t>(num_hashers);
  out->set<uint32_t>(fph);
  out->set<uint8_t>(1);
  out->set<uint32_t>(0);  // next_function: always 0 in reference streams
  out->set<uint32_t>(bits_to_cut);
  // maps (sentinel + directory injection in write_map); with use_chunks the
  // maps are omitted here and emitted via clann_ref_write_chunk instead
  out->set<uint64_t>(num_maps);
  out->set<uint8_t>(use_chunks ? 1 : 0);
  if (!use_chunks) {
    size_t off = 0;
    for (uint32_t m = 0; m < num_maps; m++) {
      write_map(out, map_lens[m], map_indices + off, map_hashes + off);
      off += map_lens[m];
    }
  }
  out->set<uint32_t>(last_rebuild);
  return out;
}

// Writes a reference-loadable stream for an FHT cross-polytope index with
// an independent source (the reference's cosine default,
// similarity_measure/cosine.hpp:16). Layout mirrors write_simhash with the
// CP function/family encodings (crosspolytope.hpp:165-240 + estimates).
void* clann_ref_write_fhtcp(
    uint32_t dims, uint32_t storage_len, uint32_t n, const int16_t* data,
    // sketch machinery (SimHash family, as in the reference default)
    uint32_t num_sketch_fns, const int16_t* sketch_planes,
    uint64_t num_sketch_words, const uint64_t* sketches,
    uint32_t sketch_hashers, uint32_t sketch_fph, uint32_t sketch_cut,
    // table machinery: FHT-CP functions as +-1 sign diagonals
    uint32_t num_hash_fns, int32_t log_dims, uint32_t num_rotations,
    const int8_t* signs,  // (num_hash_fns, num_rotations << log_dims)
    uint32_t est_reps, float est_eps,
    const float* estimates, uint32_t est_rows, uint32_t est_cols,
    uint32_t num_hashers, uint32_t fph, uint32_t bits_to_cut,
    uint32_t num_maps, const uint64_t* map_lens, const uint32_t* map_indices,
    const uint32_t* map_hashes, uint32_t last_rebuild, uint32_t use_chunks) {
  auto* out = new Writer();
  // Dataset
  out->set<uint32_t>(dims);
  out->set<uint32_t>(storage_len);
  out->set<uint32_t>(n);
  out->put(data, size_t(n) * storage_len * 2);
  // Filterer (SimHash sketches)
  out->set<uint32_t>(0);  // independent
  out->set<uint32_t>(dims);
  out->set<uint32_t>(storage_len);
  out->set<uint64_t>(num_sketch_fns);
  for (uint32_t i = 0; i < num_sketch_fns; i++) {
    out->set<uint32_t>(storage_len);
    out->put(sketch_planes + size_t(i) * storage_len, size_t(storage_len) * 2);
  }
  out->set<uint32_t>(sketch_hashers);
  out->set<uint32_t>(sketch_fph);
  out->set<uint8_t>(1);
  out->set<uint32_t>(0);  // next_function: always 0 in reference streams
  out->set<uint32_t>(sketch_cut);
  out->set<uint64_t>(num_sketch_words);
  out->put(sketches, num_sketch_words * 8);
  // HashArgs: independent + FHTCrossPolytopeArgs
  out->set<uint32_t>(0);
  out->set<int32_t>(static_cast<int32_t>(num_rotations));
  out->set<uint32_t>(est_reps);
  out->set<float>(est_eps);
  // has_hash_source
  out->set<uint8_t>(1);
  // source: FHT-CP family = desc + args + estimates
  out->set<uint32_t>(dims);
  out->set<uint32_t>(storage_len);
  out->set<int32_t>(static_cast<int32_t>(num_rotations));
  out->set<uint32_t>(est_reps);
  out->set<float>(est_eps);
  out->set<uint64_t>(est_rows);
  for (uint32_t r = 0; r < est_rows; r++) {
    out->set<uint64_t>(est_cols);
    out->put(estimates + size_t(r) * est_cols, size_t(est_cols) * 4);
  }
  out->set<float>(est_eps);
  // functions
  size_t signs_len = size_t(num_rotations) << log_dims;
  out->set<uint64_t>(num_hash_fns);
  for (uint32_t i = 0; i < num_hash_fns; i++) {
    out->set<int32_t>(static_cast<int32_t>(dims));
    out->set<int32_t>(log_dims);
    out->set<uint32_t>(num_rotations);
    out->put(signs + size_t(i) * signs_len, signs_len);
  }
  out->set<uint32_t>(num_hashers);
  out->set<uint32_t>(fph);
  out->set<uint8_t>(static_cast<uint8_t>(log_dims + 1));
  out->set<uint32_t>(0);  // next_function: always 0 in reference streams
  out->set<uint32_t>(bits_to_cut);
  // maps (same sentinel + directory injection as the simhash writer)
  out->set<uint64_t>(num_maps);
  out->set<uint8_t>(use_chunks ? 1 : 0);
  if (!use_chunks) {
    size_t off = 0;
    for (uint32_t m = 0; m < num_maps; m++) {
      write_map(out, map_lens[m], map_indices + off, map_hashes + off);
      off += map_lens[m];
    }
  }
  out->set<uint32_t>(last_rebuild);
  return out;
}

// One serialized PrefixMap chunk (collection.hpp:171-176 deserialize_chunk /
// serialize_chunks): what upstream's pickle support stores as separate byte
// strings (python_wrapper.cpp append_chunk/serialize_chunks).
void* clann_ref_write_chunk(uint64_t len, const uint32_t* indices,
                            const uint32_t* hashes) {
  auto* out = new Writer();
  write_map(out, len, indices, hashes);
  return out;
}

const uint8_t* clann_ref_out_data(void* h) {
  return static_cast<Writer*>(h)->buf.data();
}
uint64_t clann_ref_out_len(void* h) {
  return static_cast<Writer*>(h)->buf.size();
}
void clann_ref_out_free(void* h) { delete static_cast<Writer*>(h); }

}  // extern "C"
