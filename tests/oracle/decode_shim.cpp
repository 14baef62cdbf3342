// Oracle shim: drive the *reference* decoder on a .trpx file.
//
// Usage: decode_shim <dtype> <frame> <file.trpx>
//   stdout: number_of_values native-endian values of <dtype>
//
// NOTE: the reference decoder is only correct for frames 0 and 1 of
// block-aligned streams (SURVEY bugs B1/B2); conformance tests restrict
// oracle use accordingly.

#include <cmath>
#include <bit>
#include <cstdint>
#include <fstream>
#include <iostream>
#include <string>
#include <vector>

#include "Terse.hpp"

template <typename T>
int run(size_t frame, const char* path) {
    std::ifstream in(path, std::ios::binary);
    if (!in) { std::cerr << "cannot open " << path << "\n"; return 2; }
    jpa::Terse t(in);
    std::vector<T> out(t.size());
    t.prolix(out.begin(), frame);
    std::cout.write(reinterpret_cast<const char*>(out.data()), out.size() * sizeof(T));
    return 0;
}

int main(int argc, char** argv) {
    if (argc != 4) { std::cerr << "usage: decode_shim dtype frame file.trpx\n"; return 1; }
    std::string dt = argv[1];
    size_t frame = std::stoull(argv[2]);
    if (dt == "u8") return run<std::uint8_t>(frame, argv[3]);
    if (dt == "u16") return run<std::uint16_t>(frame, argv[3]);
    if (dt == "u32") return run<std::uint32_t>(frame, argv[3]);
    if (dt == "u64") return run<std::uint64_t>(frame, argv[3]);
    if (dt == "i8") return run<std::int8_t>(frame, argv[3]);
    if (dt == "i16") return run<std::int16_t>(frame, argv[3]);
    if (dt == "i32") return run<std::int32_t>(frame, argv[3]);
    if (dt == "i64") return run<std::int64_t>(frame, argv[3]);
    std::cerr << "unknown dtype " << dt << "\n";
    return 1;
}
