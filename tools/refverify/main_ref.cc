// verification driver: pdf file -> extracted text on stdout
#include <fstream>
#include <iostream>
#include <sstream>
#include <string>
#include "pdf_extractor.h"
int main(int argc, char **argv) {
  std::ifstream f(argv[1], std::ios::binary);
  std::stringstream ss;
  ss << f.rdbuf();
  try {
    std::string out = pdf2txt(ss.str());
    std::cout << out;
    return 0;
  } catch (const std::exception &e) {
    std::cerr << "ERR: " << e.what() << std::endl;
    return 1;
  }
}
